"""Step-level roofline of the flagship train step on the real TPU chip.

Round-2 verdict: bench.py reports 51k blocks/s at 13% MFU with batch scaling
flat from 500 to 2000 — unexplained. This script decomposes the compiled
train step into the quantities that name the bound:

  * XLA cost analysis:  FLOPs and HBM bytes accessed per step
      -> achieved TFLOP/s vs 197 TFLOP/s (v5e bf16 peak)
      -> achieved GB/s    vs 819 GB/s    (v5e HBM peak)
  * XLA memory analysis: temp/argument/output footprint
  * dispatch-latency floor: a chained trivial kernel measures the per-step
    host->tunnel->chip round trip that batching cannot amortize
  * optional ablations: decoder-scan unroll factor, forward-only pass

The bound is named per batch size: if achieved-GB/s is near HBM peak the step
is bandwidth-bound (blocks/s flat in batch is then EXPECTED: bytes scale with
batch); if neither ratio is high, the step is latency/serialization-bound.

    python scripts/roofline.py --batch_sizes 250,500,1000,2000
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16 = 197e12
V5E_HBM_BPS = 819e9


def _cost(step_fn, *args):
    c = step_fn.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    ma = c.memory_analysis()
    return ca, ma


def _time_multi(trainer, spc, n_groups):
    """Time the fused multi-step program; returns seconds per optimizer step."""
    import jax
    many = trainer._multi_step('decoder', spc)
    trainer.params, trainer.opt_state, trainer.key, ls = many(
        trainer.params, trainer.opt_state, trainer.key)
    jax.block_until_ready(ls)
    t0 = time.perf_counter()
    for _ in range(n_groups):
        trainer.params, trainer.opt_state, trainer.key, ls = many(
            trainer.params, trainer.opt_state, trainer.key)
    jax.block_until_ready(ls)
    return (time.perf_counter() - t0) / (n_groups * spc)


def _time_chained(step, trainer, n):
    import jax
    # donated params chain the steps (each depends on the previous update),
    # so the remote runtime cannot dedup/overlap them — honest wall clock
    for _ in range(3):
        trainer.key, k = jax.random.split(trainer.key)
        trainer.params, trainer.opt_state, loss = step(
            trainer.params, trainer.opt_state, k)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n):
        trainer.key, k = jax.random.split(trainer.key)
        trainer.params, trainer.opt_state, loss = step(
            trainer.params, trainer.opt_state, k)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch_sizes', default='250,500,1000,2000')
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--steps', type=int, default=30)
    p.add_argument('--scan_unrolls', default='1',
                   help='comma list of decoder-scan unroll factors to ablate '
                        '(5 = fully unrolled for 6 iterations)')
    p.add_argument('--steps_per_call', default='1',
                   help='comma list of fused-multi-step group sizes to '
                        'ablate (amortizes the remote dispatch round trip)')
    p.add_argument('--out', default='logs/roofline.json')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from turboae_tpu.config import Config
    from turboae_tpu.train.trainer import Trainer

    # dispatch-latency floor: chained trivial kernel
    @jax.jit
    def bump(x):
        return x + 1.0

    x = jnp.zeros(())
    x = bump(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(100):
        x = bump(x)
    jax.block_until_ready(x)
    lat = (time.perf_counter() - t0) / 100
    print(f'dispatch-latency floor (chained null kernel): {lat * 1e6:.0f} us')

    rows = []
    for spc in [int(s) for s in args.steps_per_call.split(',')]:
      for unroll in [int(u) for u in args.scan_unrolls.split(',')]:
        for bs in [int(b) for b in args.batch_sizes.split(',')]:
            cfg = Config(batch_size=bs, block_len=100, num_block=bs,
                         train_dec_channel_low=-1.5,
                         train_dec_channel_high=2.0,
                         dtype=args.dtype, scan_unroll=unroll,
                         steps_per_call=spc)
            tr = Trainer(cfg)
            key0 = jax.random.PRNGKey(0)
            ca, ma = _cost(tr._step_dec, tr.params, tr.opt_state, key0)
            flops = float(ca.get('flops', 0.0))
            bytes_acc = float(ca.get('bytes accessed', 0.0))
            if spc > 1:
                dt = _time_multi(tr, spc, max(1, args.steps // spc))
            else:
                dt = _time_chained(tr._step_dec, tr, args.steps)
            tfs = flops / dt / 1e12
            gbs = bytes_acc / dt / 1e9
            mxu = flops / dt / V5E_PEAK_BF16
            hbm = bytes_acc / dt / V5E_HBM_BPS
            bound = ('HBM-bandwidth' if hbm > 0.6 else
                     'MXU' if mxu > 0.6 else
                     'latency/serialization')
            row = {
                'batch': bs, 'unroll': unroll, 'steps_per_call': spc,
                'ms_per_step': dt * 1e3,
                'blocks_per_s': bs / dt,
                'gflop_per_step': flops / 1e9,
                'hbm_gb_per_step': bytes_acc / 1e9,
                'tflops_per_s': tfs, 'pct_mxu_peak': 100 * mxu,
                'gb_per_s': gbs, 'pct_hbm_peak': 100 * hbm,
                'temp_mb': getattr(ma, 'temp_size_in_bytes', 0) / 1e6,
                'bound': bound,
            }
            rows.append(row)
            print(f"B={bs:5d} unroll={unroll} spc={spc} {dt * 1e3:7.2f} ms/step "
                  f"{bs / dt:8.0f} blk/s | {flops / 1e9:6.1f} GF "
                  f"{tfs:6.1f} TF/s ({100 * mxu:4.1f}% MXU) | "
                  f"{bytes_acc / 1e9:6.2f} GB {gbs:6.0f} GB/s "
                  f"({100 * hbm:5.1f}% HBM) | temp {row['temp_mb']:.0f} MB "
                  f"-> {bound}", flush=True)

    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump({'dispatch_latency_us': lat * 1e6, 'rows': rows}, f,
                  indent=1)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
