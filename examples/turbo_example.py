"""End-to-end classical Turbo-757 example at several block lengths.

Mirrors reference commpy/examples/turboex.py (which warned that k=1000 x 1000
blocks x 10 SNRs takes ~3 hours on CPU) — here the same sweep takes seconds
via the batched C++/JAX decoders.

Run: python examples/turbo_example.py [-engine native|jax]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from turboae_tpu.cli.turbo_benchmark import main

if __name__ == '__main__':
    for k in (50, 100, 1000):
        print(f'===== block_len {k} =====')
        main(['-block_len', str(k), '-num_block', '500',
              '-snr_test_start', '-1', '-snr_test_end', '2',
              '-snr_points', '4'] + sys.argv[1:])
