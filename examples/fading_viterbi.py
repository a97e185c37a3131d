"""Viterbi over an i.i.d. Rayleigh-fading binary-input AWGN channel.

Mirrors reference commpy/examples/fading_BAWGN_viterbi.py: rate-1/2 [5,7]
code, K=1000, soft (euclidean) decoding of the faded+noisy observations,
BER vs SNR. The reference looped 100 blocks per SNR point in Python; here
the batched decoder sweeps all points in seconds.

Run: python examples/fading_viterbi.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from turboae_tpu.cli.conv_benchmark import main

if __name__ == '__main__':
    main(['-enc1', '5', '-enc2', '7', '-M', '2', '-channel', 'fading',
          '-block_len', '1000', '-num_block', '100',
          '-snr_test_start', '0', '-snr_test_end', '10', '-snr_points', '6']
         + sys.argv[1:])
