"""Sequence-parallel (time-axis) vs data-parallel sharding study at K=1000.

The reference concedes block_len=1000 is memory-hard and untrained
(/root/reference/docs/howtos.md:66). This framework shards the block/time
axis over the mesh ('shard_axis=time'): the interleaver permutation lowers to
an XLA all-to-all and the same-shape convs get GSPMD halo exchange. This
script quantifies what SP buys on an 8-device mesh:

  * XLA memory analysis of the compiled decoder train step (temp = activation
    workspace per device) for DP vs SP;
  * wall-clock per step for both layouts.

Run on the CPU mesh (default; 8 virtual devices) or adapt to a real slice.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/sp_study.py --block_len 1000 --batch_size 64
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--block_len', type=int, default=1000)
    p.add_argument('--batch_size', type=int, default=64)
    p.add_argument('--num_units', type=int, default=100)
    p.add_argument('--num_iteration', type=int, default=6)
    p.add_argument('--steps', type=int, default=3)
    p.add_argument('--backend', default='cpu', choices=['cpu', 'tpu'],
                   help='cpu (default): 8 virtual devices via XLA_FLAGS; '
                        'tpu: real chip(s) — NEVER while another process '
                        'holds the tunnel')
    args = p.parse_args()

    import jax
    if args.backend == 'cpu':
        # must happen before ANY device use: the axon plugin ignores a late
        # JAX_PLATFORMS env var (CLAUDE.md)
        jax.config.update('jax_platforms', 'cpu')

    from turboae_tpu.config import Config
    from turboae_tpu.dist.mesh import make_mesh
    from turboae_tpu.train.trainer import Trainer

    n_dev = len(jax.devices())
    print(f'{n_dev} {jax.default_backend()} devices')

    for shard in ('single', 'batch', 'time'):
        cfg = Config(block_len=args.block_len, batch_size=args.batch_size,
                     num_block=args.batch_size,
                     enc_num_unit=args.num_units, dec_num_unit=args.num_units,
                     num_iteration=args.num_iteration,
                     shard_axis='batch' if shard == 'single' else shard)
        mesh = None if shard == 'single' else make_mesh((n_dev,))
        tr = Trainer(cfg, mesh=mesh)
        key = jax.random.PRNGKey(0)
        lowered = tr._step_dec.lower(tr.params, tr.opt_state, key)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        try:
            tmp, argb, outb = (ma.temp_size_in_bytes,
                               ma.argument_size_in_bytes,
                               ma.output_size_in_bytes)
            print(f'[{shard}] memory analysis: temp {tmp / 1e6:.1f} MB, '
                  f'args {argb / 1e6:.1f} MB, out {outb / 1e6:.1f} MB')
        except AttributeError:
            print(f'[{shard}] memory analysis: {ma}')

        if args.steps <= 0:
            continue
        # timed steps (first is compile-warm already)
        tr.params, tr.opt_state, loss = tr._step_dec(tr.params, tr.opt_state,
                                                     key)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for i in range(args.steps):
            key, k = jax.random.split(key)
            tr.params, tr.opt_state, loss = tr._step_dec(tr.params,
                                                         tr.opt_state, k)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.steps
        print(f'[{shard}] {dt * 1e3:.1f} ms/step '
              f'({args.batch_size / dt:.1f} blocks/s), loss {float(loss):.4f}')


if __name__ == '__main__':
    main()
