"""Micro-benchmark: fused Pallas conv stacks vs XLA's unfused conv chain.

Measures the flagship decoder's hot block (5-layer SameShapeConv1d, C=100,
K=5) at bench shapes on the real TPU. Resolves the README "Pallas where XLA
stops" claim with numbers (VERDICT round 1: the f32 shifted-matmul kernel
measured 2x slower than XLA; this adds the im2col bf16 variant).

    python scripts/bench_conv_stack.py [--B 500] [--L 100] [--C 100]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_chained(stack_fn, layers, cin, n):
    """One jitted program: n stack applications chained through a data
    dependency (lax.scan). Measures pure device time per application —
    independent dispatches over the remote tunnel get deduped/cached and
    produce impossible >peak numbers."""
    import jax
    import jax.numpy as jnp

    def body(x, _):
        y = stack_fn(layers, x)
        # feed a slice of the output back as the next input; tanh keeps the
        # chain numerically bounded without changing the measured kernel
        return jnp.tanh(y[:, :, :cin].astype(jnp.float32)), ()

    @jax.jit
    def run(x0):
        x, _ = jax.lax.scan(body, x0, None, length=n)
        return x

    return run


def timeit(stack_fn, layers, x, cin, n=100):
    import jax
    run = make_chained(stack_fn, layers, cin, n)
    jax.block_until_ready(run(x))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(run(x))
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--B', type=int, default=500)
    p.add_argument('--L', type=int, default=100)
    p.add_argument('--C', type=int, default=100)
    p.add_argument('--Cin', type=int, default=7)
    p.add_argument('--K', type=int, default=5)
    p.add_argument('--layers', type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    from turboae_tpu.ops.conv1d import stack_init, stack_apply
    from turboae_tpu.kernels.conv_stack import (fused_stack_apply,
                                                fused_stack_apply_bf16)

    key = jax.random.PRNGKey(0)
    layers = stack_init(key, args.layers, args.Cin, args.C, args.K)
    x = jax.random.normal(jax.random.PRNGKey(1), (args.B, args.L, args.Cin))

    flops = 2 * args.B * args.L * args.K * args.C * (
        args.Cin + (args.layers - 1) * args.C)

    xla_f32 = lambda l, x: stack_apply(l, x)
    xla_bf16 = lambda l, x: stack_apply(l, x, compute_dtype=jnp.bfloat16)

    results = {}
    for name, fn in [('xla_f32', xla_f32), ('xla_bf16', xla_bf16),
                     ('pallas_f32', fused_stack_apply),
                     ('pallas_im2col_bf16', fused_stack_apply_bf16)]:
        dt = timeit(fn, layers, x, args.Cin)
        results[name] = dt
        print(f'{name:22s} {dt * 1e3:8.3f} ms   '
              f'{flops / dt / 1e12:6.1f} TFLOP/s', flush=True)

    best_pl = min(results['pallas_f32'], results['pallas_im2col_bf16'])
    best_xla = min(results['xla_f32'], results['xla_bf16'])
    print(f'pallas/xla best ratio: {best_pl / best_xla:.3f} '
          f'({"pallas wins" if best_pl < best_xla else "xla wins"})')

    # numerics cross-check at these shapes
    import numpy as np
    ref = np.asarray(jax.jit(xla_f32)(layers, x))
    got = np.asarray(jax.jit(fused_stack_apply_bf16)(layers, x),
                     dtype=np.float32)
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f'im2col_bf16 max rel err vs f32: {rel:.2e}')


if __name__ == '__main__':
    main()
