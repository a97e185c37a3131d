"""LDPC FER Monte-Carlo benchmark (reference commpy/ldpc_simulation.py +
tests/test_ldpc.py methodology: all-zero codeword over AWGN, BP decode until
a frame-error budget is hit).

    python -m turboae_tpu.cli.ldpc_benchmark -design /path/design.txt \
        -ebn0_start 2.0 -ebn0_end 2.5 -points 2
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('-design', default='',
                   help='Gallager design file; empty -> generated (96,48)')
    p.add_argument('-n', type=int, default=96)
    p.add_argument('-dv', type=int, default=3)
    p.add_argument('-dc', type=int, default=6)
    p.add_argument('-alg', choices=['SPA', 'MSA'], default='SPA')
    p.add_argument('-n_iters', type=int, default=100)
    p.add_argument('-ebn0_start', type=float, default=2.0)
    p.add_argument('-ebn0_end', type=float, default=2.5)
    p.add_argument('-points', type=int, default=2)
    p.add_argument('-target_frame_errors', type=int, default=50)
    p.add_argument('-max_frames', type=int, default=5000)
    p.add_argument('-batch', type=int, default=256)
    p.add_argument('-engine', choices=['jax', 'numpy'], default='jax')
    p.add_argument('-seed', type=int, default=0)
    return p.parse_args(argv)


def run(args):
    from ..classical.ldpc import (get_ldpc_code_params, gallager_ldpc_design,
                                  ldpc_bp_decode, make_jax_ldpc_decoder)

    if args.design:
        params = get_ldpc_code_params(args.design)
    else:
        params = gallager_ldpc_design(args.n, args.dv, args.dc, args.seed)
    n = params['n_vnodes']
    rate = 1.0 - params['n_cnodes'] / n
    rng = np.random.RandomState(args.seed)

    jdec = None
    if args.engine == 'jax':
        import jax
        jdec = jax.jit(make_jax_ldpc_decoder(params, args.alg, args.n_iters))

    if args.points == 1:
        ebn0s = [args.ebn0_start]
    else:
        ebn0s = list(np.linspace(args.ebn0_start, args.ebn0_end, args.points))
    fers, bers = [], []
    for ebn0 in ebn0s:
        noise_var = 1.0 / (2 * rate * 10 ** (ebn0 / 10.0))
        fe = be = frames = 0
        t0 = time.time()
        while fe < args.target_frame_errors and frames < args.max_frames:
            B = args.batch
            rx = 1.0 + np.sqrt(noise_var) * rng.randn(B, n)  # all-zero codeword
            llr = 2.0 * rx / noise_var
            if jdec is not None:
                import jax.numpy as jnp
                bits, _ = jdec(jnp.asarray(llr))
                bits = np.asarray(bits)
            else:
                bits = np.stack([ldpc_bp_decode(llr[i], params, args.alg,
                                                args.n_iters)[0]
                                 for i in range(B)])
            fe += int((bits.sum(axis=1) > 0).sum())
            be += int(bits.sum())
            frames += B
        fer = fe / frames
        ber = be / (frames * n)
        fers.append(fer); bers.append(ber)
        print(f'[testing]Eb/N0: {ebn0:.2f}, FER: {fer:.3e}, BER: {ber:.3e} '
              f'({frames} frames, {time.time() - t0:.1f}s)')
    print('[Result]EbN0:', ebn0s)
    print('[Result]FER:', fers)
    print('[Result]BER:', bers)
    return ebn0s, fers, bers


def main(argv=None):
    return run(get_args(argv))


if __name__ == '__main__':
    main()
