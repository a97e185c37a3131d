"""FTAE (feedback AE) BER/BLER evaluation with exact error counts.

    python scripts/eval_ftae.py --ckpt artifacts/ftae.msgpack \
        --num_block 200000 --out artifacts/eval_ftae.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--ckpt', default='artifacts/ftae.msgpack')
    p.add_argument('--num_block', type=int, default=200000)
    p.add_argument('--batch_size', type=int, default=2000)
    p.add_argument('--block_len', type=int, default=50)
    p.add_argument('--dec_type', default='turboae_cnn')
    p.add_argument('--fb_channel_low', type=float, default=40.0)
    p.add_argument('--fb_channel_high', type=float, default=40.0)
    p.add_argument('--ftae_power_alloc', default='none',
                   choices=['none', 'pos', 'pos_phase'],
                   help='must match the checkpoint being evaluated')
    p.add_argument('--snrs', type=float, nargs='*',
                   default=[-2.0, -1.0, 0.0, 1.0, 2.0])
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--out', default='logs/ftae_eval.json')
    args = p.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from turboae_tpu.config import Config
    from turboae_tpu.train.ftae_trainer import FTAETrainer
    from turboae_tpu.train.checkpoint import load_checkpoint
    from scripts.eval_flagship import wilson_ci

    cfg = Config(batch_size=args.batch_size, block_len=args.block_len,
                 dec_type=args.dec_type, dtype=args.dtype,
                 fb_channel_low=args.fb_channel_low,
                 fb_channel_high=args.fb_channel_high,
                 ftae_power_alloc=args.ftae_power_alloc)
    tr = FTAETrainer(cfg)
    # a power-alloc checkpoint evaluated without the matching flag would
    # silently drop the learned pw/ps leaves (the tolerant merge keeps the
    # template) and report uniform-power numbers — make that an error
    from flax import serialization
    with open(args.ckpt, 'rb') as f:
        saved = serialization.msgpack_restore(f.read())
    saved_params = saved.get('params', saved)
    ck_has_pw = 'pw' in saved_params.get('fwd_enc1', {})
    cfg_has_pw = args.ftae_power_alloc != 'none'
    if ck_has_pw != cfg_has_pw:
        raise SystemExit(
            f'{args.ckpt}: checkpoint {"HAS" if ck_has_pw else "has NO"} '
            f'power-allocation weights but --ftae_power_alloc='
            f'{args.ftae_power_alloc} — pass the mode the checkpoint was '
            'trained with')
    tr.params = load_checkpoint(args.ckpt, tr.params)
    print(f'loaded {args.ckpt}', flush=True)

    t0 = time.time()
    r = tr.sweep(args.snrs, num_block=args.num_block)
    dt = time.time() - t0
    rate = r['n_blocks'] * len(args.snrs) / dt
    print(f'eval: {rate:.0f} blk/s')
    out = dict(r)
    out.update({'ckpt': args.ckpt, 'dtype': args.dtype,
                'fb_channel_low': args.fb_channel_low,
                'ber_ci95': [wilson_ci(e, r['n_bits'])
                             for e in r['bit_errors']],
                'eval_blocks_per_s': rate})
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
