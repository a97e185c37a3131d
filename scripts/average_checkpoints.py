"""Average the params of N checkpoints into one (model soup).

Cheap candidate generator for closing the last cells against the published
curve: a waterfall-strong and a floor-strong fine-tune of the SAME parent
checkpoint stay mode-connected, so their weight average often inherits both
strengths. Rank the result with scripts/select_checkpoint.py.

    python scripts/average_checkpoints.py --out tmp/soup.msgpack \
        artifacts/flagship.msgpack tmp/flagship_floor2.msgpack.e100 \
        --weights 0.5 0.5
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('ckpts', nargs='+')
    p.add_argument('--weights', type=float, nargs='*', default=None,
                   help='per-checkpoint weights (default: uniform)')
    p.add_argument('--out', required=True)
    args = p.parse_args()

    import numpy as np
    from flax import serialization

    w = args.weights or [1.0 / len(args.ckpts)] * len(args.ckpts)
    assert len(w) == len(args.ckpts)
    s = sum(w)
    w = [x / s for x in w]

    acc = None
    for wi, path in zip(w, args.ckpts):
        with open(path, 'rb') as f:
            payload = serialization.msgpack_restore(f.read())
        params = payload.get('params', payload)
        import jax
        scaled = jax.tree.map(lambda a: wi * np.asarray(a, np.float64), params)
        acc = scaled if acc is None else jax.tree.map(
            lambda x, y: x + y, acc, scaled)
    import jax
    acc = jax.tree.map(lambda a: np.asarray(a, np.float32), acc)

    from turboae_tpu.train.checkpoint import save_checkpoint
    save_checkpoint(args.out, acc)
    print(f'wrote {args.out} = ' + ' + '.join(
        f'{wi:.3f}*{p}' for wi, p in zip(w, args.ckpts)))


if __name__ == '__main__':
    main()
