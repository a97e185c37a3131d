"""Classical Turbo code Monte-Carlo benchmark.

Reference: commpy/turbo_codes_benchmark.py — per-SNR mp.Pool fan-out of
per-block Python encode/corrupt/decode (~1 block/s/core; k=1000 x 1000 blocks
x 10 SNRs ≈ 3h, commpy/examples/turboex.py:19-20).

Here: vectorized numpy batch encode + C++ batched hazzys turbo decode (with
numpy fallback), or --engine jax for the batched log-domain BCJR decoder on
the accelerator. Either engine covers the same BER/BLER curve orders of
magnitude faster.

Usage:
    python -m turboae_tpu.cli.turbo_benchmark -block_len 100 -num_block 1000 \
        -snr_test_start -1.5 -snr_test_end 2 -snr_points 8 -num_dec_iter 6
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def get_bench_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('-code', choices=['757', 'lte'], default='757')
    p.add_argument('-block_len', type=int, default=100)
    p.add_argument('-num_block', type=int, default=1000)
    p.add_argument('-num_dec_iter', type=int, default=6)
    p.add_argument('-snr_test_start', type=float, default=-1.5)
    p.add_argument('-snr_test_end', type=float, default=2.0)
    p.add_argument('-snr_points', type=int, default=8)
    p.add_argument('-batch_size', type=int, default=1000)
    p.add_argument('-engine', choices=['native', 'numpy', 'jax', 'jax_mc'],
                   default='native',
                   help='jax_mc: fully on-device Monte-Carlo (bits+encode+'
                        'noise+decode in one XLA program) — the deep-tail '
                        'engine for the accelerator')
    p.add_argument('-variant', choices=['hazzys', 'hazzys_g'], default='hazzys')
    p.add_argument('-num_threads', type=int, default=0,
                   help='native engine worker threads (<=0: all cores)')
    p.add_argument('-noise_type', default='awgn',
                   help='awgn | t-dist | radar | bsc | bec | ge | ge_awgn | '
                        'fading — classical corrupt_signal semantics '
                        '(reference commpy/utils.py:45-247). The decoder '
                        'stays the Gaussian-LLR turbo decoder (mismatched '
                        'decoding on non-Gaussian channels, the TurboAE '
                        "paper's classical-baseline setup)")
    p.add_argument('-vv', type=float, default=5.0, help='t-dist dof')
    p.add_argument('-radar_power', type=float, default=5.0)
    p.add_argument('-radar_prob', type=float, default=0.05)
    p.add_argument('-target_bit_err', type=int, default=0,
                   help='stop a SNR point early once this many bit errors '
                        'are collected (0 = always run num_block blocks); '
                        'num_block stays the cap — standard practice for '
                        'deep-tail Monte-Carlo')
    p.add_argument('-seed', type=int, default=0)
    return p.parse_args(argv)


def run_benchmark(args):
    from ..classical.trellis import turbo757_trellis, turbo_lte_trellis
    from ..classical.interleavers import RandInterlv
    from ..classical.turbo import (turbo_encode_batch, hazzys_turbo_decode,
                                   hazzys_g_turbo_decode)

    trellis = turbo_lte_trellis() if args.code == 'lte' else turbo757_trellis()
    inter = RandInterlv(args.block_len, 0)
    rng = np.random.RandomState(args.seed)
    # the non-AWGN path goes through classical.channels.corrupt_signal, which
    # draws from the GLOBAL numpy RNG — seed it too so non-AWGN baseline runs
    # are reproducible from -seed like the AWGN path
    np.random.seed(args.seed)

    jax_decoder = None
    if args.engine == 'jax':
        from ..classical.turbo import make_jax_turbo_decoder
        import jax
        jax_decoder = jax.jit(make_jax_turbo_decoder(
            trellis, inter.p_array, args.num_dec_iter, args.variant))
    mc_step = None
    if args.engine == 'jax_mc':
        from ..classical.turbo import make_jax_turbo_mc
        import jax
        mc_step = make_jax_turbo_mc(trellis, inter.p_array,
                                    args.num_dec_iter, args.variant,
                                    batch=args.batch_size)
        mc_key = jax.random.PRNGKey(args.seed)

    interval = (args.snr_test_end - args.snr_test_start) / max(1, args.snr_points - 1)
    snrs = [args.snr_test_start + interval * i for i in range(args.snr_points)]
    bers, blers = [], []

    for snr in snrs:
        sigma = 10 ** (-snr / 20.0)
        t0 = time.time()
        n_err = 0
        n_block_err = 0
        n_done = 0
        while n_done < args.num_block:
            B = min(args.batch_size, args.num_block - n_done)
            if args.engine == 'jax_mc':
                import jax
                mc_key, k = jax.random.split(mc_key)
                be, ble = mc_step(k, sigma)   # full batch_size on device
                n_err += int(be)
                n_block_err += int(ble)
                n_done += args.batch_size
                if args.target_bit_err and n_err >= args.target_bit_err:
                    break
                continue
            msgs = rng.randint(0, 2, (B, args.block_len))
            codes = turbo_encode_batch(msgs, trellis, inter.p_array)
            if args.noise_type == 'awgn':
                rx = 2.0 * codes - 1.0 + sigma * rng.randn(B, args.block_len, 3)
            else:
                # non-AWGN impairments via the classical corrupt_signal layer
                # (reference commpy/utils.py:45-247); the Gaussian-LLR decoder
                # below is then MISMATCHED — the classical-baseline setup the
                # TurboAE paper compares against on ATN/radar channels
                from ..classical.channels import corrupt_signal
                rx = corrupt_signal(codes, args.noise_type, sigma=sigma,
                                    vv=args.vv, radar_power=args.radar_power,
                                    radar_prob=args.radar_prob)

            if args.engine == 'jax':
                import jax.numpy as jnp
                dec = np.asarray(jax_decoder(jnp.asarray(rx[:, :, 0]),
                                             jnp.asarray(rx[:, :, 1]),
                                             jnp.asarray(rx[:, :, 2]),
                                             sigma ** 2))
            else:
                dec = None
                if args.engine == 'native':
                    from ..native import native_turbo_decode_batch
                    dec = native_turbo_decode_batch(
                        rx[:, :, 0], rx[:, :, 1], rx[:, :, 2], trellis,
                        sigma ** 2, args.num_dec_iter, inter.p_array,
                        variant=args.variant, num_threads=args.num_threads)
                if dec is None:  # numpy fallback
                    host_dec = (hazzys_g_turbo_decode
                                if args.variant == 'hazzys_g'
                                else hazzys_turbo_decode)
                    dec = np.stack([host_dec(
                        rx[i, :, 0], rx[i, :, 1], rx[i, :, 2], trellis,
                        sigma ** 2, args.num_dec_iter, inter)
                        for i in range(B)])

            err = dec != msgs
            n_err += int(err.sum())
            n_block_err += int((err.sum(axis=1) > 0).sum())
            n_done += B
            if args.target_bit_err and n_err >= args.target_bit_err:
                break

        ber = n_err / (n_done * args.block_len)
        bler = n_block_err / n_done
        bers.append(ber)
        blers.append(bler)
        print(f'[testing]SNR: {snr:.2f}, BER: {ber:.3e}, BLER: {bler:.3e}, '
              f'{n_err} bit errs / {n_done} blocks, '
              f'{time.time() - t0:.1f}s ({n_done / (time.time() - t0):.0f} blk/s)',
              flush=True)

    print('[Result]SNR:', snrs)
    print('[Result]BER:', bers)
    print('[Result]BLER:', blers)
    return snrs, bers, blers


def main(argv=None):
    return run_benchmark(get_bench_args(argv))


if __name__ == '__main__':
    main()
