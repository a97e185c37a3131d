"""Same-shape 1D/2D conv stacks — the framework's hot compute blocks.

Reference: cnn_utils.py:6-82 (SameShapeConv1d / DenseSameShapeConv1d) and
:89-154 (2D variants). The reference transposes (B,L,C)<->(B,C,L) around every
torch Conv1d; here tensors stay feature-last (B, L, C) end to end — the layout
TPUs want — and the conv lowers straight onto the MXU via
lax.conv_general_dilated with ('NWC','WIO','NWC') dimension numbers.

Parameters are plain pytrees: {'w': (K, Cin, Cout), 'b': (Cout,)} per layer.
Init matches torch.nn.Conv1d's default (Kaiming-uniform with a=sqrt(5), i.e.
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias).

Dtype policy: params are stored in float32; `apply` casts inputs/params to
cfg dtype (bfloat16 supported) and accumulates in float32 on the MXU via
preferred_element_type.
"""
from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
from jax import lax

Params = Any


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def conv1d_init(key, in_channels: int, out_channels: int, kernel_size: int) -> Params:
    """One Conv1d layer's params, torch-default init."""
    kw, kb = jax.random.split(key)
    fan_in = in_channels * kernel_size
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        'w': _uniform(kw, (kernel_size, in_channels, out_channels), bound),
        'b': _uniform(kb, (out_channels,), bound),
    }


def conv1d_apply(params: Params, x: jnp.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
    """Same-length 1D conv on (B, L, Cin) -> (B, L, Cout).

    padding = kernel//2 on each side, matching torch's padding=(k//2) for odd k
    (cnn_utils.py:16). Accumulation in float32 regardless of compute dtype.
    """
    w = params['w'].astype(compute_dtype)
    k = w.shape[0]
    pad = k // 2
    # bf16 note: conv's VJP requires operand dtypes to match, so under bf16 the
    # output stays bf16 (the MXU still accumulates in f32 internally); under
    # f32 we request f32 accumulation explicitly.
    preferred = jnp.float32 if compute_dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x.astype(compute_dtype), w,
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=('NWC', 'WIO', 'NWC'),
        preferred_element_type=preferred,
    )
    return y + params['b'].astype(compute_dtype)


def stack_init(key, num_layer: int, in_channels: int, out_channels: int,
               kernel_size: int) -> List[Params]:
    """SameShapeConv1d: first layer Cin->Cout, rest Cout->Cout (cnn_utils.py:13-23)."""
    keys = jax.random.split(key, num_layer)
    layers = [conv1d_init(keys[0], in_channels, out_channels, kernel_size)]
    for i in range(1, num_layer):
        layers.append(conv1d_init(keys[i], out_channels, out_channels, kernel_size))
    return layers


def stack_apply(layers: List[Params], x, act=jax.nn.elu, no_act: bool = False,
                compute_dtype=jnp.float32):
    """Apply the conv stack with per-layer activation (cnn_utils.py:36-46)."""
    for p in layers:
        x = conv1d_apply(p, x, compute_dtype)
        if not no_act:
            x = act(x)
    return x


def dense_stack_init(key, num_layer: int, in_channels: int, out_channels: int,
                     kernel_size: int) -> List[Params]:
    """DenseSameShapeConv1d: layer i sees in + i*out channels (cnn_utils.py:55-65)."""
    keys = jax.random.split(key, num_layer)
    layers = []
    for i in range(num_layer):
        cin = in_channels + i * out_channels
        layers.append(conv1d_init(keys[i], cin, out_channels, kernel_size))
    return layers


def dense_stack_apply(layers: List[Params], x, act=jax.nn.elu,
                      compute_dtype=jnp.float32):
    """DenseNet-style concat of all previous activations (cnn_utils.py:67-82)."""
    this_input = x
    out = x
    for i, p in enumerate(layers):
        if i > 0:
            this_input = jnp.concatenate([this_input, out], axis=-1)
        out = act(conv1d_apply(p, this_input, compute_dtype))
    return out


def linear_init(key, in_features: int, out_features: int) -> Params:
    """torch.nn.Linear-compatible init."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_features)
    return {
        'w': _uniform(kw, (in_features, out_features), bound),
        'b': _uniform(kb, (out_features,), bound),
    }


def linear_apply(params: Params, x, compute_dtype=jnp.float32):
    y = jnp.dot(x.astype(compute_dtype), params['w'].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    return y + params['b']  # f32 out: heads feed power-norm / extrinsic math


# ---------------- 2D variants (reference cnn_utils.py:89-154) ----------------

def conv2d_init(key, in_channels: int, out_channels: int, kernel_size: int) -> Params:
    kw, kb = jax.random.split(key)
    fan_in = in_channels * kernel_size * kernel_size
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        'w': _uniform(kw, (kernel_size, kernel_size, in_channels, out_channels), bound),
        'b': _uniform(kb, (out_channels,), bound),
    }


def conv2d_apply(params: Params, x, compute_dtype=jnp.float32):
    """Same-shape 2D conv on (B, H, W, Cin) — feature-last for TPU."""
    w = params['w'].astype(compute_dtype)
    k = w.shape[0]
    pad = k // 2
    preferred = jnp.float32 if compute_dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x.astype(compute_dtype), w,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=preferred,
    )
    return y + params['b'].astype(compute_dtype)


def stack2d_init(key, num_layer: int, in_channels: int, out_channels: int,
                 kernel_size: int) -> List[Params]:
    keys = jax.random.split(key, num_layer)
    layers = [conv2d_init(keys[0], in_channels, out_channels, kernel_size)]
    for i in range(1, num_layer):
        layers.append(conv2d_init(keys[i], out_channels, out_channels, kernel_size))
    return layers


def stack2d_apply(layers: List[Params], x, no_act: bool = False,
                  compute_dtype=jnp.float32):
    for p in layers:
        x = conv2d_apply(p, x, compute_dtype)
        if not no_act:
            x = jax.nn.elu(x)
    return x


def dense_stack2d_init(key, num_layer: int, in_channels: int, out_channels: int,
                       kernel_size: int) -> List[Params]:
    keys = jax.random.split(key, num_layer)
    return [conv2d_init(keys[i], in_channels + i * out_channels, out_channels,
                        kernel_size) for i in range(num_layer)]


def dense_stack2d_apply(layers: List[Params], x, no_act: bool = False,
                        compute_dtype=jnp.float32):
    this_input = x
    out = x
    for i, p in enumerate(layers):
        if i > 0:
            this_input = jnp.concatenate([this_input, out], axis=-1)
        out = conv2d_apply(p, this_input, compute_dtype)
        if not no_act:
            out = jax.nn.elu(out)
    return out
