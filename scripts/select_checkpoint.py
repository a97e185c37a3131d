"""Sweep a set of checkpoints against the published 114255 arrays and rank
them by dominance (cells strictly below the published BER/BLER).

One process, one Trainer: the compiled sweep program is reused across
checkpoints, so each 12-point 100k-block sweep costs ~11 s on the chip.

    python scripts/select_checkpoint.py --num_block 100000 \
        tmp/flagship_floor.msgpack.e* tmp/flagship_floor.msgpack.best
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('ckpts', nargs='+')
    p.add_argument('--num_block', type=int, default=100000)
    p.add_argument('--batch_size', type=int, default=2000)
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--out', default='logs/select_checkpoint.jsonl')
    args = p.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from turboae_tpu.config import Config
    from turboae_tpu.train.trainer import Trainer
    from turboae_tpu.train.checkpoint import load_checkpoint
    from turboae_tpu.results.reference_curves import TURBOAE_CNN_K100_FULL

    ref = TURBOAE_CNN_K100_FULL
    cfg = Config(batch_size=args.batch_size, num_block=args.num_block,
                 dtype=args.dtype)
    trainer = Trainer(cfg)
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    results = []
    with open(args.out, 'a') as f:
        for ck in args.ckpts:
            trainer.params = load_checkpoint(ck, trainer.params)
            r = trainer.sweep(ref['snr'], num_block=args.num_block,
                              verbose=False)
            ber_w = [i for i in range(12) if r['ber'][i] < ref['ber'][i]]
            bler_w = [i for i in range(12) if r['bler'][i] < ref['bler'][i]]
            row = {'ckpt': ck, 'ber_wins': len(ber_w),
                   'bler_wins': len(bler_w),
                   'ber_losses': [ref['snr'][i] for i in range(12)
                                  if i not in ber_w],
                   'bler_losses': [ref['snr'][i] for i in range(12)
                                   if i not in bler_w],
                   'ber': r['ber'], 'bler': r['bler'],
                   'bit_errors': r['bit_errors'],
                   'blk_errors': r['blk_errors']}
            f.write(json.dumps(row) + '\n')
            f.flush()
            results.append(row)
            print(f"{ck}: BER {row['ber_wins']}/12 BLER {row['bler_wins']}/12 "
                  f"(losses: ber@{row['ber_losses']} bler@{row['bler_losses']})",
                  flush=True)
    best = max(results, key=lambda r: (r['ber_wins'] + r['bler_wins'],
                                       -r['ber'][7]))
    print('BEST:', best['ckpt'], best['ber_wins'], best['bler_wins'])


if __name__ == '__main__':
    main()
