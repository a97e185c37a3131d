"""Benchmark: coded blocks/s through the FULL train step on one chip.

Baseline (BASELINE.md): the reference trains ~2000 blocks/s (50k blocks in
~24.5 s/epoch, batch 500, K=100, rate 1/3, 6 decoder iterations) on a 1080Ti
through the full train step (sample+forward+backward+opt).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_BLOCKS_PER_S = 2000.0
# TPU v5e (1 chip) dense peak: 197 TFLOP/s bf16 / 394 TOPS int8
V5E_PEAK_BF16_FLOPS = 197e12


def _step_flops(step_fn, *args):
    """XLA cost-analysis FLOPs of one compiled train step (fwd+bwd+opt).

    Returns None when cost analysis is unavailable so the JSON reports
    mfu/tflops as null rather than plausible-looking zeros."""
    try:
        cost = step_fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get('flops', 0.0))
    except Exception as e:
        print(f'warning: cost_analysis failed ({e!r}); mfu unreported',
              file=sys.stderr)
        return None


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch_size', type=int, default=500,
                    help='default 500 = the reference training recipe; '
                         'larger batches measure the chip ceiling')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from turboae_tpu.config import Config
    from turboae_tpu.train.trainer import Trainer

    # flagship training config (reference tmp/114255_log.txt run: batch 500,
    # K=100); bfloat16 conv compute — verified loss-equivalent to f32
    # (0.1580 vs 0.1579 after identical schedules) and +25% throughput.
    # scan_unroll=5 fully unrolls the decoder-iteration scan: +17% throughput
    # (10.76 -> 9.20 ms/step, i.e. -14.5% step time)
    # (XLA pipelines across iterations; numerics bit-identical, regression-
    # tested in tests/test_models.py) AND makes cost_analysis FLOPs correct —
    # XLA counts a rolled lax.scan body ONCE, which is what made round-2
    # report 13% MFU (258 GF/step) when the true figure is 744 GF/step.
    cfg = Config(batch_size=args.batch_size, block_len=100,
                 num_block=args.batch_size,
                 train_dec_channel_low=-1.5, train_dec_channel_high=2.0,
                 dtype='bfloat16', scan_unroll=5)
    trainer = Trainer(cfg)

    # compile + warm up both phases
    trainer.train_epoch(0, 'decoder', verbose=False)
    trainer.train_epoch(0, 'encoder', verbose=False)

    # FLOPs of each compiled step (cached compile; donation is fine to lower)
    key0 = jax.random.PRNGKey(0)
    dec_flops = _step_flops(trainer._step_dec, trainer.params,
                            trainer.opt_state, key0)
    enc_flops = _step_flops(trainer._step_enc, trainer.params,
                            trainer.opt_state, key0)

    # timed: alternating schedule 1 enc : 5 dec like the reference epoch
    n_steps = 60
    step_dec = trainer._step_dec
    step_enc = trainer._step_enc
    t0 = time.perf_counter()
    for i in range(n_steps):
        trainer.key, k = jax.random.split(trainer.key)
        step = step_enc if i % 6 == 0 else step_dec
        trainer.params, trainer.opt_state, loss = step(
            trainer.params, trainer.opt_state, k)
    jax.block_until_ready(trainer.params)
    dt = time.perf_counter() - t0

    blocks_per_s = n_steps * cfg.batch_size / dt
    out = {
        'metric': 'train_blocks_per_s',
        'value': round(blocks_per_s, 1),
        'unit': 'blocks/s/chip (rate-1/3, K=100, 6 dec iters, full train step)',
        'vs_baseline': round(blocks_per_s / BASELINE_BLOCKS_PER_S, 3),
    }
    if enc_flops is not None and dec_flops is not None:
        # alternating 1 enc : 5 dec schedule -> weighted FLOPs per step
        avg_step_flops = (enc_flops + 5.0 * dec_flops) / 6.0
        flops_per_s = avg_step_flops * n_steps / dt
        out['mfu'] = round(flops_per_s / V5E_PEAK_BF16_FLOPS, 4)
        out['tflops_per_s'] = round(flops_per_s / 1e12, 2)
        out['step_flops'] = {'enc': enc_flops, 'dec': dec_flops}
    else:
        out['mfu'] = out['tflops_per_s'] = out['step_flops'] = None
    print(json.dumps(out))


if __name__ == '__main__':
    main()
