"""Pallas TPU kernel: fused same-shape Conv1d stack.

Motivation: the flagship decoder runs 12 stacks x 5 Conv1d layers per forward
(reference decoders.py:157-269). XLA lowers each conv to an MXU op but does
NOT fuse conv->conv — every layer round-trips its (B, L, C) activation through
HBM (~20 MB each at the bench shapes), making the decoder HBM-bandwidth-bound.
This kernel keeps the whole stack's activations resident in VMEM: the grid
tiles the batch; per tile, each layer is computed as K shifted
(TB*L, Cin)x(Cin, Cout) MXU matmuls accumulated in f32, with ELU applied
in-register, and only the final layer's output is written back.

Forward-only fusion with a recompute-based custom_vjp: the backward pass
re-runs the unfused XLA path (cheap relative to training's matmul cost, and
keeps gradients bit-identical to ops/conv1d.stack_apply). Used by default on
the eval/serving path; training uses it too via the custom_vjp.

Layout notes: C (lane dim) should be a multiple of 128 for full MXU
utilization; the bench config (C=100) pads to 128 lanes. Tile TB chosen so 2
activation buffers (TB, L+K-1, C) f32 fit comfortably in ~16 MB VMEM.

MEASURED (1x TPU v5e, B=500 L=100 C=100 K=5, 5 layers): this kernel runs
1.13 ms vs 0.57 ms for XLA's unfused conv chain — XLA's conv kernels win at
these shapes because the K-loop of small (TB*L, C) matmuls (C=100 padded to
128 lanes) underutilizes the MXU more than the per-layer HBM round trips
cost. Kept as an experimental kernel (numerics validated to 4e-4); NOT wired
into the model path. To beat XLA here the matmuls need K folded into the
contraction (im2col in VMEM, (TB*L, K*C) x (K*C, C)) and a bf16 data path —
future work.
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _elu(x):
    # jax.nn.elu uses expm1, which Mosaic doesn't lower; exp is available
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _stack_kernel(x_ref, w0_ref, b0_ref, wr_ref, br_ref, out_ref,
                  buf_a, buf_b, *, num_layer: int, K: int, L: int):
    """One batch tile: x (TB, L, Cin) -> out (TB, L, C).

    buf_a/buf_b: (TB, L + K - 1, C) VMEM scratch, ping-pong between layers.
    w0: (K, Cin, C); wr: (num_layer-1, K, C, C); b0: (1, C); br: (nl-1, 1, C).
    """
    TB = x_ref.shape[0]
    Cin = x_ref.shape[2]
    C = w0_ref.shape[2]
    pad = K // 2

    # ---- layer 0: read x from its ref (shape (TB, L, Cin)) ----
    x = x_ref[:]
    acc = jnp.zeros((TB * L, C), jnp.float32)
    # shifted matmuls: y[:, l] = sum_k x[:, l + k - pad] @ W0[k]
    xp = jnp.pad(x, ((0, 0), (pad, K - 1 - pad), (0, 0)))
    for k in range(K):
        xs = xp[:, k:k + L, :].reshape(TB * L, Cin)
        acc += jnp.dot(xs, w0_ref[k], preferred_element_type=jnp.float32)
    y = _elu(acc + b0_ref[0])
    buf_a[:, pad:pad + L, :] = y.reshape(TB, L, C)
    # zero the halo once; later layers reuse it
    buf_a[:, :pad, :] = jnp.zeros((TB, pad, C), jnp.float32)
    buf_a[:, pad + L:, :] = jnp.zeros((TB, K - 1 - pad, C), jnp.float32)
    buf_b[:, :pad, :] = jnp.zeros((TB, pad, C), jnp.float32)
    buf_b[:, pad + L:, :] = jnp.zeros((TB, K - 1 - pad, C), jnp.float32)

    # ---- layers 1..num_layer-1: VMEM-resident ping-pong ----
    src, dst = buf_a, buf_b
    for layer in range(num_layer - 1):
        acc = jnp.zeros((TB * L, C), jnp.float32)
        for k in range(K):
            xs = src[:, k:k + L, :].reshape(TB * L, C)
            acc += jnp.dot(xs, wr_ref[layer, k],
                           preferred_element_type=jnp.float32)
        y = _elu(acc + br_ref[layer, 0])
        if layer == num_layer - 2:
            out_ref[:] = y.reshape(TB, L, C)
        else:
            dst[:, pad:pad + L, :] = y.reshape(TB, L, C)
        src, dst = dst, src

    if num_layer == 1:
        out_ref[:] = buf_a[:, pad:pad + L, :]


def _pack(layers: List[dict]):
    """ops/conv1d stack params -> (w0, b0, wr, br) stacked arrays."""
    w0 = layers[0]['w']
    b0 = layers[0]['b'].reshape(1, -1)
    if len(layers) > 1:
        wr = jnp.stack([l['w'] for l in layers[1:]])
        br = jnp.stack([l['b'].reshape(1, -1) for l in layers[1:]])
    else:
        C = w0.shape[2]
        wr = jnp.zeros((0, w0.shape[0], C, C), w0.dtype)
        br = jnp.zeros((0, 1, C), w0.dtype)
    return w0, b0, wr, br


def _fused_forward(layers: List[dict], x: jnp.ndarray,
                   tile_b: int = 0) -> jnp.ndarray:
    B, L, Cin = x.shape
    num_layer = len(layers)
    w0, b0, wr, br = _pack(layers)
    K = w0.shape[0]
    C = w0.shape[2]

    if tile_b <= 0:
        # pick TB so the tile's VMEM footprint (2 scratch buffers + in/out
        # blocks + accumulator temporaries, roughly 6x a (TB, L+K-1, C) f32
        # buffer) stays within the 16MB scoped limit with headroom
        budget = 10 * 1024 * 1024
        tile_b = max(4, min(B, budget // max(1, 6 * (L + K - 1) * C * 4)))
        while B % tile_b != 0:
            tile_b -= 1
    grid = (B // tile_b,)

    kernel = functools.partial(_stack_kernel, num_layer=num_layer, K=K, L=L)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, L, C), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, L, Cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Cin, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wr.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(br.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, L, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_b, L + K - 1, C), jnp.float32),
            pltpu.VMEM((tile_b, L + K - 1, C), jnp.float32),
        ],
    )(x.astype(jnp.float32), w0, b0, wr, br)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_stack_apply(layers, x):
    """Drop-in fused replacement for ops.conv1d.stack_apply (ELU activation).

    Forward: single Pallas kernel, activations VMEM-resident across layers.
    Backward: recompute via the unfused XLA path (gradients identical).
    """
    return _fused_forward(layers, x)


def _fwd(layers, x):
    return _fused_forward(layers, x), (layers, x)


def _bwd(res, g):
    layers, x = res
    from ..ops.conv1d import stack_apply

    def ref(layers, x):
        return stack_apply(layers, x)

    _, vjp = jax.vjp(ref, layers, x)
    return vjp(g)


fused_stack_apply.defvjp(_fwd, _bwd)
