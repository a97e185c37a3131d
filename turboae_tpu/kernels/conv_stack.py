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

MEASURED (1x TPU v5e, B=500 L=100 C=100 K=5, 5 layers, dependency-chained
lax.scan timing so the remote runtime cannot dedupe dispatches):
    XLA f32 conv chain      0.43 ms
    XLA bf16 conv chain     0.44 ms
    pallas f32 (this file)  1.06 ms
    pallas im2col bf16      1.16 ms
XLA wins at these shapes. The f32==bf16 XLA timing shows the stack is NOT
MXU-bound here (it is latency/HBM-bound), so folding K into the contraction
(im2col, (TB*L, K*C) x (K*C, C)) and the bf16 data path do not pay for the
kernel's sequential grid + VPU im2col-build overhead. Both variants are kept,
numerics-tested (tests/test_kernels.py), and wired behind cfg.use_fused_conv
(default OFF) for future shapes where the trade flips (e.g. much larger C).
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
    # zero the halo once; later layers reuse it (K=1 has no halo and Mosaic
    # may reject zero-size Ref stores, so the guards are Python-static)
    if pad:
        buf_a[:, :pad, :] = jnp.zeros((TB, pad, C), jnp.float32)
        buf_b[:, :pad, :] = jnp.zeros((TB, pad, C), jnp.float32)
    if K - 1 - pad:
        buf_a[:, pad + L:, :] = jnp.zeros((TB, K - 1 - pad, C), jnp.float32)
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
    if num_layer == 1:
        # dummy 1-deep block: a 0-size BlockSpec dim breaks grid padding
        wr = jnp.zeros((1, K, C, C), w0.dtype)
        br = jnp.zeros((1, 1, C), w0.dtype)

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


def _stack_kernel_im2col(x_ref, w0_ref, b0_ref, wr_ref, br_ref, out_ref,
                         buf_a, buf_b, *, num_layer: int, K: int, L: int):
    """im2col-in-VMEM bf16 variant (the future-work sketch above, landed).

    Per layer, the K shifted matmuls are folded into ONE MXU contraction:
    im2col (TB*L, K*C) x (K*C, C), accumulated in f32. With C=100 the folded
    contraction dim (500 -> 512 lanes) wastes 2.3%% of the MXU instead of the
    22%% a 100->128-padded per-tap matmul wastes, and the bf16 data path
    doubles peak. Activations stay VMEM-resident between layers (bf16
    ping-pong buffers, halo pre-zeroed).

    x (TB, L, Cin) bf16; w0 (K*Cin, C) bf16; wr (num_layer-1, K*C, C) bf16;
    b0 (1, C) f32; br (nl-1, 1, C) f32; out (TB, L, C) bf16.
    """
    TB = x_ref.shape[0]
    Cin = x_ref.shape[2]
    C = out_ref.shape[2]
    pad = K // 2

    # ---- layer 0: im2col straight from the input block ----
    xp = jnp.pad(x_ref[:], ((0, 0), (pad, K - 1 - pad), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, k:k + L, :].reshape(TB * L, Cin) for k in range(K)], axis=1)
    acc = jnp.dot(cols, w0_ref[:], preferred_element_type=jnp.float32)
    y = _elu(acc + b0_ref[0])
    buf_a[:, pad:pad + L, :] = y.reshape(TB, L, C).astype(jnp.bfloat16)
    # K=1 has no halo; zero-size Ref stores may be rejected by Mosaic
    if pad:
        zeros_lo = jnp.zeros((TB, pad, C), jnp.bfloat16)
        buf_a[:, :pad, :] = zeros_lo
        buf_b[:, :pad, :] = zeros_lo
    if K - 1 - pad:
        zeros_hi = jnp.zeros((TB, K - 1 - pad, C), jnp.bfloat16)
        buf_a[:, pad + L:, :] = zeros_hi
        buf_b[:, pad + L:, :] = zeros_hi

    # ---- layers 1..num_layer-1: VMEM-resident ping-pong ----
    src, dst = buf_a, buf_b
    for layer in range(num_layer - 1):
        cols = jnp.concatenate(
            [src[:, k:k + L, :].reshape(TB * L, C) for k in range(K)], axis=1)
        acc = jnp.dot(cols, wr_ref[layer],
                      preferred_element_type=jnp.float32)
        y = _elu(acc + br_ref[layer, 0])
        if layer == num_layer - 2:
            out_ref[:] = y.reshape(TB, L, C).astype(jnp.bfloat16)
        else:
            dst[:, pad:pad + L, :] = y.reshape(TB, L, C).astype(jnp.bfloat16)
        src, dst = dst, src

    if num_layer == 1:
        out_ref[:] = buf_a[:, pad:pad + L, :]


def _fused_forward_im2col(layers: List[dict], x: jnp.ndarray,
                          tile_b: int = 0) -> jnp.ndarray:
    B, L, Cin = x.shape
    num_layer = len(layers)
    w0, b0, wr, br = _pack(layers)
    K = w0.shape[0]
    C = w0.shape[2]

    # fold the tap axis into the contraction dim: (K, Cin, C) -> (K*Cin, C)
    w0_f = w0.reshape(K * Cin, C).astype(jnp.bfloat16)
    if num_layer > 1:
        wr_f = wr.reshape(num_layer - 1, K * C, C).astype(jnp.bfloat16)
    else:
        # dummy 1-deep block: a 0-size BlockSpec dim breaks grid padding
        wr_f = jnp.zeros((1, K * C, C), jnp.bfloat16)
    b0_f = b0.astype(jnp.float32)
    br_f = br.astype(jnp.float32)
    if num_layer == 1:
        br_f = jnp.zeros((1, 1, C), jnp.float32)

    if tile_b <= 0:
        # tile VMEM: 2 bf16 ping-pong buffers (TB, L+K-1, C), the bf16 im2col
        # temporary (TB*L, K*C), the f32 accumulator (TB*L, C), in/out blocks;
        # Mosaic stack-allocates relayout temporaries on top, so budget ~4x
        # headroom under the raised 64M scoped limit
        per_tb = (2 * (L + K - 1) * C * 2 + 2 * L * K * C * 2 + 2 * L * C * 4
                  + L * Cin * 2 + 2 * L * C * 2)
        budget = 12 * 1024 * 1024
        tile_b = max(4, min(B, budget // max(1, per_tb)))
        while B % tile_b != 0:
            tile_b -= 1
    grid = (B // tile_b,)

    kernel = functools.partial(_stack_kernel_im2col, num_layer=num_layer,
                               K=K, L=L)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, L, C), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, L, Cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * Cin, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wr_f.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(br_f.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, L, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_b, L + K - 1, C), jnp.bfloat16),
            pltpu.VMEM((tile_b, L + K - 1, C), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x.astype(jnp.bfloat16), w0_f, b0_f, wr_f, br_f)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_stack_apply_bf16(layers, x):
    """bf16 im2col fused stack: forward in one Pallas kernel, backward via
    recompute on the unfused XLA path (same scheme as fused_stack_apply)."""
    return _fused_forward_im2col(layers, x)


def _fwd_bf16(layers, x):
    return _fused_forward_im2col(layers, x), (layers, x)


def _bwd_bf16(res, g):
    # the fused forward emits bf16; the recompute path is f32 -> cast the
    # cotangent up before feeding the unfused vjp
    layers, x = res
    from ..ops.conv1d import stack_apply

    def ref(layers, x):
        return stack_apply(layers, x)

    out, vjp = jax.vjp(ref, layers, x)
    return vjp(g.astype(out.dtype))


fused_stack_apply_bf16.defvjp(_fwd_bf16, _bwd_bf16)


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
