"""Deep (1e6-block) BLER-first checkpoint selection at the contested SNRs.

Round-4 verdict item 3: the crown beats the published 114255 curve at 21/24
cells; the residuals are BLER@2.0 and both metrics @3.5 dB, where the
published values carry 4-105 errors (±19-100%). This ranks the candidate
pool on BLER@2.0 with EXACT counts at >=1e6 blocks (the repo's statistics
discipline: never chase a <100-error cell) instead of the BER-first ranking
used in round 4.

Selection-bias note: the winner of this ranking must be RE-measured with a
fresh seed (scripts/eval_flagship.py) before any table claim — picking the
minimum of N noisy draws and publishing that same draw would bias low.

    python scripts/select_bler_deep.py --num_block 1000000 \
        --snrs 2.0 3.5 tmp/soup_*.msgpack artifacts/flagship.msgpack
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('ckpts', nargs='+')
    p.add_argument('--num_block', type=int, default=1000000)
    p.add_argument('--batch_size', type=int, default=2000)
    p.add_argument('--snrs', type=float, nargs='+', default=[2.0, 3.5])
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--out', default='logs/select_bler_deep.jsonl')
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
                 dtype=args.dtype)
    trainer = Trainer(cfg)
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    rows = []
    with open(args.out, 'a') as f:
        for ck in args.ckpts:
            trainer.params = load_checkpoint(ck, trainer.params)
            r = trainer.sweep(args.snrs, num_block=args.num_block,
                              verbose=False)
            row = {'ckpt': ck, 'snr': r['snr'], 'ber': r['ber'],
                   'bler': r['bler'], 'bit_errors': r['bit_errors'],
                   'blk_errors': r['blk_errors'], 'n_bits': r['n_bits'],
                   'n_blocks': r['n_blocks']}
            f.write(json.dumps(row) + '\n')
            f.flush()
            rows.append(row)
            cells = ' '.join(
                f'snr{r["snr"][i]}: ber {r["ber"][i]:.3e} ({r["bit_errors"][i]}) '
                f'bler {r["bler"][i]:.3e} ({r["blk_errors"][i]})'
                for i in range(len(r['snr'])))
            print(f'{ck}: {cells}', flush=True)
    best = min(rows, key=lambda r: r['bler'][0])
    print(f"BEST by BLER@{args.snrs[0]}: {best['ckpt']} "
          f"{best['bler'][0]:.4e} ({best['blk_errors'][0]} errs)")


if __name__ == '__main__':
    main()
