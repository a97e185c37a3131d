"""Learned modulation / demodulation (reference modulations.py:46-110).

Modulation reshapes the code (B, L, n) into symbols of mod_rate coded values,
runs 1x1 conv stacks to 2 (I/Q) channels, then applies one of three power
controls: 'qpsk' (whiten + STE binarize), 'symbol_power' (per-I/Q-channel
whiten), 'block_power' (global whiten).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import conv1d as cv
from ..ops.ste import mod_quantize


def _dtype(cfg):
    return jnp.bfloat16 if cfg.dtype == 'bfloat16' else jnp.float32


def _std_bessel(x, axis=None):
    m = jnp.mean(x, axis=axis, keepdims=axis is not None)
    n = x.size if axis is None else x.shape[0] * x.shape[1] if isinstance(axis, tuple) else x.shape[axis]
    return jnp.sqrt(jnp.sum((x - m) ** 2, axis=axis, keepdims=axis is not None) / (n - 1))


def mod_init(key, cfg):
    k1, k2 = jax.random.split(key)
    return {'layer': cv.stack_init(k1, cfg.mod_num_layer, cfg.mod_rate,
                                   cfg.mod_num_unit, 1),
            'final': cv.stack_init(k2, 1, cfg.mod_num_unit, 2, 1)}


def mod_apply(params, cfg, codes):
    dt = _dtype(cfg)
    b = codes.shape[0]
    n_sym = cfg.block_len * cfg.code_rate_n // cfg.mod_rate
    x = codes.reshape(b, n_sym, cfg.mod_rate)
    h = cv.stack_apply(params['layer'], x, compute_dtype=dt)
    sym = cv.stack_apply(params['final'], h, no_act=True, compute_dtype=dt)

    if cfg.mod_pc == 'qpsk':
        sym = (sym - jnp.mean(sym)) / _std_bessel(sym)
        return mod_quantize(sym)
    if cfg.mod_pc == 'symbol_power':
        # per-SYMBOL-POSITION stats over (batch, I/Q) — reference
        # modulations.py:74-81: mean(dim=2).mean(dim=0) and Bessel std of the
        # (B*2, T) view along dim=0, both broadcast as (1, T, 1)
        mean = jnp.mean(sym, axis=(0, 2), keepdims=True)
        cnt = sym.shape[0] * sym.shape[2]
        std = jnp.sqrt(jnp.sum((sym - mean) ** 2, axis=(0, 2), keepdims=True)
                       / (cnt - 1))
        return (sym - mean) / std
    # block_power
    return (sym - jnp.mean(sym)) / _std_bessel(sym)


def demod_init(key, cfg):
    k1, k2 = jax.random.split(key)
    return {'layer': cv.stack_init(k1, cfg.demod_num_layer, 2, cfg.demod_num_unit, 1),
            'final': cv.stack_init(k2, 1, cfg.demod_num_unit, cfg.mod_rate, 1)}


def demod_apply(params, cfg, symbols):
    dt = _dtype(cfg)
    b = symbols.shape[0]
    h = cv.stack_apply(params['layer'], symbols, compute_dtype=dt)
    out = cv.stack_apply(params['final'], h, no_act=True, compute_dtype=dt)
    return out.reshape(b, cfg.block_len, cfg.code_rate_n)
