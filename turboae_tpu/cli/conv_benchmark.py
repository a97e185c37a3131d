"""Convolutional-code Viterbi Monte-Carlo benchmark.

Reference: commpy/conv_codes_benchmark.py (and the low-latency
conv_codes_llcode.py variant via -tb_depth). Per-block mp.Pool Python in the
reference; here batch numpy encode + C++ Viterbi (numpy fallback) or the
batched JAX Viterbi on the accelerator.

Channels cover the reference set: awgn, t-dist (decoded with the matching
tdist3/tdist5 metric), radar variants via classical.channels.corrupt_signal,
fading.
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('-enc1', type=int, default=7, help='octal generator 1')
    p.add_argument('-enc2', type=int, default=5, help='octal generator 2')
    p.add_argument('-enc3', type=int, default=0,
                   help='octal generator 3 (rate 1/3, relay benchmark)')
    p.add_argument('-enc4', type=int, default=0,
                   help='octal generator 4 (rate 1/4, relay benchmark)')
    p.add_argument('-fair', type=int, default=0,
                   help='zero the tail received symbols for fair comparison '
                        'with unterminated neural decoders '
                        '(reference relay_conv_codes_benchmark.py)')
    p.add_argument('-M', type=int, default=2, help='memory')
    p.add_argument('-feedback', type=int, default=0)
    p.add_argument('-code_type', choices=['default', 'rsc'], default='default')
    p.add_argument('-channel', default='awgn',
                   choices=['awgn', 't-dist', 'radar', 'awgn+radar', 'fading',
                            'bsc', 'radar_erasure', 'radar_saturate'])
    p.add_argument('-decoding_type', default='unquantized',
                   choices=['hard', 'unquantized', 'tdist3', 'tdist5'])
    p.add_argument('-vv', type=float, default=5.0)
    p.add_argument('-radar_power', type=float, default=20.0)
    p.add_argument('-radar_prob', type=float, default=5e-2)
    p.add_argument('-block_len', type=int, default=100)
    p.add_argument('-num_block', type=int, default=1000)
    p.add_argument('-tb_depth', type=int, default=0, help='0 = full traceback')
    p.add_argument('-snr_test_start', type=float, default=0.0)
    p.add_argument('-snr_test_end', type=float, default=6.0)
    p.add_argument('-snr_points', type=int, default=4)
    p.add_argument('-engine', choices=['native', 'numpy', 'jax'], default='native')
    p.add_argument('-seed', type=int, default=0)
    return p.parse_args(argv)


def run(args):
    from ..classical.trellis import Trellis
    from ..classical.convcode import (conv_encode_batch, viterbi_decode,
                                      make_jax_viterbi)
    from ..classical.channels import corrupt_signal

    gens = [args.enc1, args.enc2]
    if args.enc3:
        gens.append(args.enc3)
    if args.enc4:
        gens.append(args.enc4)
    trellis = Trellis(np.array([args.M]), np.array([gens]),
                      args.feedback, args.code_type)
    n = trellis.n
    M = trellis.total_memory
    rng = np.random.RandomState(args.seed)
    np.random.seed(args.seed)

    if args.tb_depth and args.engine != 'numpy':
        # only the numpy host decoder implements windowed traceback; the
        # native/jax engines are full-traceback (ML)
        print(f'[conv_benchmark] -tb_depth {args.tb_depth}: using numpy engine')
        args.engine = 'numpy'

    jdec = None
    if args.engine == 'jax':
        import jax
        jdec = jax.jit(make_jax_viterbi(trellis, args.decoding_type))

    interval = (args.snr_test_end - args.snr_test_start) / max(1, args.snr_points - 1)
    snrs = [args.snr_test_start + interval * i for i in range(args.snr_points)]
    bers, blers = [], []

    for snr in snrs:
        if args.channel == 'bsc':
            # the swept value IS the flip probability (trainer.test()
            # semantics); the reference benchmark feeds the awgn sigma
            # formula into np.random.choice's p= and crashes for snr<0
            sigma = snr
        else:
            sigma = 10 ** (-snr / 20.0)
        t0 = time.time()
        msgs = rng.randint(0, 2, (args.num_block, args.block_len))
        coded = conv_encode_batch(msgs, trellis, args.code_type)
        T = coded.shape[1] // n
        rx = corrupt_signal(coded.reshape(-1), args.channel, sigma=sigma,
                            vv=args.vv, radar_power=args.radar_power,
                            radar_prob=args.radar_prob).reshape(args.num_block, T, n)
        if args.channel == 'bsc':
            # hard decisions back to bits for hard decoding
            rx = (rx > 0).astype(float)
        if args.fair:
            # zero ALL n*M tail coded symbols (the termination bits), making
            # the (L, n*(L+M)) code comparable to an unterminated (L, n*L)
            # neural decoder. The reference hard-codes 2*M
            # (relay_conv_codes_benchmark.py:110) which is the full tail only
            # at rate 1/2; for -enc3/-enc4 rates that under-zeroes.
            rx = rx.reshape(args.num_block, -1)
            rx[:, -n * M:] = 0.0
            rx = rx.reshape(args.num_block, T, n)

        if args.engine == 'jax':
            import jax.numpy as jnp
            dec = np.asarray(jdec(jnp.asarray(rx, dtype=jnp.float32)))
        else:
            dec = np.zeros((args.num_block, T), int)
            native_ok = args.engine == 'native'
            if native_ok:
                from ..native import native_viterbi
                for i in range(args.num_block):
                    d = native_viterbi(rx[i], trellis, args.decoding_type)
                    if d is None:
                        native_ok = False
                        break
                    dec[i] = d
            if not native_ok:
                tb = args.tb_depth if args.tb_depth else None
                for i in range(args.num_block):
                    dec[i] = viterbi_decode(rx[i].reshape(-1), trellis,
                                            tb_depth=tb,
                                            decoding_type=args.decoding_type)

        err = dec[:, :args.block_len] != msgs
        ber = err.mean()
        bler = (err.sum(axis=1) > 0).mean()
        bers.append(float(ber)); blers.append(float(bler))
        print(f'[testing]SNR: {snr:.2f}, BER: {ber:.3e}, BLER: {bler:.3e}, '
              f'{time.time() - t0:.1f}s')

    print('[Result]SNR:', snrs)
    print('[Result]BER:', bers)
    print('[Result]BLER:', blers)
    return snrs, bers, blers


def main(argv=None):
    return run(get_args(argv))


if __name__ == '__main__':
    main()
