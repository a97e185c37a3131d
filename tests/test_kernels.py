"""Pallas TPU kernel numerics, validated on CPU via interpret mode.

The fused conv-stack kernels (kernels/conv_stack.py) must reproduce
ops.conv1d.stack_apply: the f32 shifted-matmul variant to f32 tolerance, the
bf16 im2col variant to bf16 tolerance. Gradients route through the recompute
custom_vjp and must match the unfused path exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from turboae_tpu.ops.conv1d import stack_init, stack_apply
from turboae_tpu.kernels.conv_stack import (
    _fused_forward, _fused_forward_im2col, fused_stack_apply_bf16)


def _mk(num_layer=3, cin=7, cout=100, k=5, B=8, L=20, seed=0):
    layers = stack_init(jax.random.PRNGKey(seed), num_layer, cin, cout, k)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, L, cin))
    return layers, x


def test_fused_f32_matches_unfused():
    layers, x = _mk()
    ref = np.asarray(stack_apply(layers, x))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_fused_forward(layers, x, tile_b=4))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_fused_im2col_bf16_matches_unfused():
    layers, x = _mk()
    ref = np.asarray(stack_apply(layers, x))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_fused_forward_im2col(layers, x, tile_b=4),
                         dtype=np.float32)
    # bf16 matmuls with f32 accumulation: ~0.5% relative
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 0.01


@pytest.mark.parametrize('num_layer', [1, 2])
def test_fused_im2col_bf16_short_stacks(num_layer):
    layers, x = _mk(num_layer=num_layer, B=4, L=12)
    ref = np.asarray(stack_apply(layers, x))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_fused_forward_im2col(layers, x, tile_b=4),
                         dtype=np.float32)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 0.02


def test_fused_bf16_grads_match_unfused():
    """custom_vjp backward recomputes the unfused path -> exact grad match."""
    layers, x = _mk(num_layer=2, B=4, L=12)

    def loss_fused(layers, x):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_stack_apply_bf16(layers, x).astype(
                jnp.float32) ** 2)

    def loss_ref(layers, x):
        return jnp.sum(stack_apply(layers, x) ** 2)

    gf = jax.grad(loss_ref)(layers, x)
    # cotangent differs (fused fwd is bf16) but the vjp rule itself is the
    # unfused path; compare against the ref-grad to bf16-forward tolerance
    gg = jax.grad(loss_fused)(layers, x)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gg)):
        denom = np.max(np.abs(np.asarray(a))) + 1e-6
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) / denom < 0.05
