"""Straight-through-estimator quantizers via jax.custom_vjp.

The reference carries three near-identical STE autograd Functions:
  1. args-driven encoder STE (reference: encoders.py:20-57) used inside the
     power constraint when train_channel_mode == 'block_norm_ste';
  2. hard-coded rx-quantizer (reference: ste.py:6-39) with limit 1.0 and
     gradient clamp +-0.25, used for received-signal quantization
     (channel_ae.py:67-69) and FTAE;
  3. modulation STE (reference: modulations.py:11-41): input-clip only.

Here one parameterized custom_vjp covers all three, replicating the exact
backward semantics: zero the cotangent where the *saved input* exceeds the
limit ('inputs'/'both' clipping), then clamp the cotangent ('gradient'/'both').
Note the reference zeroes grads BEFORE clamping — order preserved.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _quantize_fwd(x, value_limit: float, quantize_level: float):
    """Forward: clamp then binarize (sign) or uniform multi-level rounding
    (reference encoders.py:27-36)."""
    lim = value_limit
    x_clamped = jnp.clip(x, -lim, lim)
    if quantize_level == 2:
        return jnp.sign(x_clamped)
    rng = 2.0 * lim
    scale = (quantize_level - 1.0) / rng
    return jnp.round((x_clamped + lim) * scale) / scale - lim


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def ste_quantize(x, value_limit: float = 1.0, quantize_level: float = 2,
                 grad_limit: float = 0.01, clipping: str = 'both'):
    """STE quantizer. clipping in {'inputs', 'gradient', 'both', 'none'}
    (reference get_args.py:170, encoders.py:38-46)."""
    return _quantize_fwd(x, value_limit, quantize_level)


def _ste_fwd(x, value_limit, quantize_level, grad_limit, clipping):
    return _quantize_fwd(x, value_limit, quantize_level), x


def _ste_bwd(value_limit, quantize_level, grad_limit, clipping, saved_x, g):
    if clipping in ('inputs', 'both'):
        in_range = (saved_x <= value_limit) & (saved_x >= -value_limit)
        g = jnp.where(in_range, g, 0.0)
    if clipping in ('gradient', 'both'):
        g = jnp.clip(g, -grad_limit, grad_limit)
    return (g,)


ste_quantize.defvjp(_ste_fwd, _ste_bwd)


def rx_quantize(x, quant_limit: float = 1.0, quant_level: float = 2):
    """Received-signal quantizer (reference ste.py:6-39): input-gated STE with
    hard-coded +-1.0 input gate and +-0.25 gradient clamp."""
    return ste_quantize(x, quant_limit, quant_level, 0.25, 'both')


def mod_quantize(x):
    """Modulation STE (reference modulations.py:11-41): limit 1.0, binary,
    input-gating only (no gradient clamp)."""
    return ste_quantize(x, 1.0, 2, 0.0, 'inputs')
