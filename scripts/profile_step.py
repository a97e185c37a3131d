"""Capture an xprof trace of the flagship train step and print the op-level
time breakdown.

Two subcommands so capture (TPU) and analysis (CPU) can run separately —
the chip tunnel must never be held by two processes (CLAUDE.md):

    python scripts/profile_step.py capture --out logs/trace_step
    python scripts/profile_step.py report --trace logs/trace_step

The report aggregates self-time by HLO category (convolution fwd/bwd, fusion,
all-reduce, copy/transpose, ...) from the .xplane.pb via the xprof /
tensorboard_plugin_profile converter — the quantitative decomposition the
round-2 verdict asked for ("what explains the other 87%"; answer recorded in
RESULTS.md: the rolled-scan cost-analysis undercount plus non-128 channels).
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(args):
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from turboae_tpu.config import Config
    from turboae_tpu.train.trainer import Trainer

    cfg = Config(batch_size=args.batch_size, block_len=100,
                 num_block=args.batch_size,
                 train_dec_channel_low=-1.5, train_dec_channel_high=2.0,
                 dtype=args.dtype, scan_unroll=args.scan_unroll)
    tr = Trainer(cfg)
    # warm up / compile outside the trace
    for _ in range(3):
        tr.key, k = jax.random.split(tr.key)
        tr.params, tr.opt_state, loss = tr._step_dec(tr.params, tr.opt_state, k)
    jax.block_until_ready(loss)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            tr.key, k = jax.random.split(tr.key)
            tr.params, tr.opt_state, loss = tr._step_dec(tr.params,
                                                         tr.opt_state, k)
        jax.block_until_ready(loss)
    print('trace written to', args.out)


def report(args):
    paths = sorted(glob.glob(os.path.join(args.trace, '**', '*.xplane.pb'),
                             recursive=True))
    if not paths:
        sys.exit(f'no .xplane.pb under {args.trace}')
    print('parsing', paths[-1])
    # the standalone xprof package's converter matches its own pywrap; the
    # tensorboard_plugin_profile one is version-skewed against tensorflow here
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], 'framework_op_stats^', {})
    if isinstance(data, bytes):
        data = data.decode('utf-8', 'replace')
    # gviz JSON: rows of [rank, host/device, op type, op name, occurrences,
    # total time, avg, total self time, ...]; fall back to raw dump on drift
    try:
        tab = json.loads(data)
        if isinstance(tab, list):  # converter wraps the gviz table in a list
            tab = tab[0]
        ids = [c['id'] for c in tab['cols']]
        ix = {k: ids.index(k) for k in
              ('host_or_device', 'type', 'operation', 'total_self_time',
               'measured_flop_rate', 'measured_memory_bw', 'bound_by')}
        rows = []
        for row in tab['rows']:
            c = row['c']
            if c[ix['host_or_device']]['v'] != 'Device':
                continue
            rows.append({k: c[i]['v'] for k, i in ix.items()})
        total = sum(r['total_self_time'] for r in rows)
        agg = {}
        for r in rows:
            agg[r['type']] = agg.get(r['type'], 0.0) + r['total_self_time']
        print(f'\n-- device self-time by op category (total {total:.0f} us) --')
        print(f'{"category":<26} {"us":>10} {"share":>7}')
        for typ, t in sorted(agg.items(), key=lambda kv: -kv[1]):
            print(f'{typ:<26} {t:>10.0f} {100 * t / total:>6.1f}%')
        print('\n-- top 8 ops --')
        for r in sorted(rows, key=lambda r: -r['total_self_time'])[:8]:
            print(f"{r['total_self_time']:>10.0f} us {100 * r['total_self_time'] / total:>5.1f}%  "
                  f"{r['measured_flop_rate'] / 1e3:>7.1f} TF/s {r['measured_memory_bw']:>6.0f} GB/s "
                  f"bound={r['bound_by']:<8} {r['operation'][:70]}")
    except Exception as e:  # tool schema drifted: dump for manual reading
        print('structured parse failed:', e)
        print(data[:5000])


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='cmd', required=True)
    c = sub.add_parser('capture')
    c.add_argument('--out', default='logs/trace_step')
    c.add_argument('--steps', type=int, default=3)
    c.add_argument('--batch_size', type=int, default=500)
    c.add_argument('--dtype', default='bfloat16')
    c.add_argument('--scan_unroll', type=int, default=5)
    r = sub.add_parser('report')
    r.add_argument('--trace', default='logs/trace_step')
    args = p.parse_args()
    if args.cmd == 'capture':
        capture(args)
    else:
        report(args)


if __name__ == '__main__':
    main()
