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
    args = p.parse_args()

    from turboae_tpu.config import Config
    from turboae_tpu.train.trainer import Trainer
    from turboae_tpu.train.checkpoint import load_checkpoint

    cfg = Config(batch_size=args.batch_size, num_block=args.num_block,
                 encoder=args.encoder, decoder=args.decoder,
                 test_channel_mode=args.test_channel_mode,
                 snr_points=args.snr_points)
    trainer = Trainer(cfg)
    trainer.params = load_checkpoint(args.ckpt, trainer.params)
    print(f'loaded {args.ckpt}', flush=True)

    t0 = time.time()
    snrs, ber, bler = trainer.test(verbose=True)
    dt = time.time() - t0
    blocks = args.num_block * args.snr_points * 2  # main + punctured pass
    print(f'eval: {blocks} blocks in {dt:.1f}s ({blocks / dt:.0f} blk/s)')

    # 95% Wilson confidence intervals on each BER point
    import math
    n_bits = args.num_block * cfg.block_len
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
