"""Full BER/BLER evaluation of a trained flagship checkpoint.

The BASELINE.json north-star protocol: rate-1/3, K=100, AWGN, 12 SNR points
from -1.5 to 4.0 dB at >=100k blocks per point.

    python scripts/eval_flagship.py --ckpt tmp/flagship.msgpack \
        --num_block 100000 --out logs/flagship_eval.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--ckpt', default='tmp/flagship.msgpack')
    p.add_argument('--num_block', type=int, default=100000)
    p.add_argument('--batch_size', type=int, default=2000)
    p.add_argument('--snr_points', type=int, default=12)
    p.add_argument('--out', default='logs/flagship_eval.json')
    p.add_argument('--encoder', default='TurboAE_rate3_cnn',
                   help='e.g. Turbo_rate3_757 for DeepTurbo checkpoints')
    p.add_argument('--decoder', default='TurboAE_rate3_cnn')
    p.add_argument('--test_channel_mode', default='block_norm',
                   help='block_norm_ste for TurboAE-binary checkpoints')
    p.add_argument('--block_len', type=int, default=100,
                   help='must match the training block_len (the interleaver '
                        'permutation depends on it; conv params load either '
                        'way so a mismatch would be SILENTLY wrong)')
    p.add_argument('--dec_num_layer', type=int, default=5)
    p.add_argument('--dtype', default='float32')
    args = p.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from turboae_tpu.config import Config
    from turboae_tpu.train.trainer import Trainer
    from turboae_tpu.train.checkpoint import load_checkpoint

    cfg = Config(batch_size=args.batch_size, num_block=args.num_block,
                 encoder=args.encoder, decoder=args.decoder,
                 test_channel_mode=args.test_channel_mode,
                 block_len=args.block_len, dec_num_layer=args.dec_num_layer,
                 dtype=args.dtype,
                 snr_points=args.snr_points)
    trainer = Trainer(cfg)
    trainer.params = load_checkpoint(args.ckpt, trainer.params)
    print(f'loaded {args.ckpt}', flush=True)

    t0 = time.time()
    snrs, ber, bler = trainer.test(verbose=True)
    dt = time.time() - t0
    # test() runs num_block//batch_size batches per SNR point, twice
    # (main + punctured pass); the encoder_power pass at the end is excluded
    blocks = (args.num_block // args.batch_size) * args.batch_size \
        * args.snr_points * 2
    print(f'eval: {blocks} blocks in {dt:.1f}s ({blocks / dt:.0f} blk/s)')

    # 95% Wilson confidence intervals on each BER point
    import math
    n_bits = (args.num_block // args.batch_size) * args.batch_size \
        * cfg.block_len
    z = 1.96
    ci = []
    for p_hat in ber:
        denom = 1 + z * z / n_bits
        center = (p_hat + z * z / (2 * n_bits)) / denom
        half = z * math.sqrt(max(p_hat * (1 - p_hat) / n_bits, 0) +
                             z * z / (4 * n_bits * n_bits)) / denom
        ci.append([max(center - half, 0.0), center + half])

    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump({'snr': snrs, 'ber': ber, 'bler': bler, 'ber_ci95': ci,
                   'num_block': args.num_block, 'ckpt': args.ckpt,
                   'eval_blocks_per_s': blocks / dt}, f, indent=1)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
