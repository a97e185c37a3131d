"""Power normalization (the encoder's transmit power constraint).

Reference: ENCBase.power_constraint (encoders.py:102-125): whiten the whole
code tensor with the *global* batch mean/std, optionally STE-binarize
(train_channel_mode == 'block_norm_ste'), optionally clamp.

TPU note: under a batch-sharded mesh the jnp.mean/std reductions are global —
GSPMD inserts the cross-device psum automatically, so sharded and single-device
runs produce identical numerics (the reference's DataParallel actually computed
*per-replica* stats; we match the single-device semantics, which is what its
published results used).

torch.std uses Bessel's correction (ddof=1) — replicated here.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from .ste import ste_quantize


class NormStats(NamedTuple):
    """Running mean/std for deployment-time precomputed normalization
    (reference encoders.py:76-84, 110-114)."""
    mean: jnp.ndarray   # scalar
    std: jnp.ndarray    # scalar
    count: jnp.ndarray  # scalar float


def init_norm_stats() -> NormStats:
    return NormStats(jnp.zeros(()), jnp.ones(()), jnp.zeros(()))


def _std_bessel(x):
    n = x.size
    m = jnp.mean(x)
    return jnp.sqrt(jnp.sum((x - m) ** 2) / (n - 1))


def power_constraint(x, cfg, training: bool = True,
                     stats: Optional[NormStats] = None):
    """Apply the block power constraint.

    Returns (codes, new_stats). `stats` threads the running-average state when
    cfg.precompute_norm_stats is set (test-time deployment path); otherwise it
    passes through unchanged.
    """
    if cfg.no_code_norm:
        return x, stats

    this_mean = jnp.mean(x)
    this_std = _std_bessel(x)

    if cfg.precompute_norm_stats and stats is not None:
        cnt = stats.count + 1.0
        new_mean = (stats.mean * (cnt - 1.0) + this_mean) / cnt
        new_std = (stats.std * (cnt - 1.0) + this_std) / cnt
        x_norm = (x - new_mean) / new_std
        stats = NormStats(new_mean, new_std, cnt)
    else:
        x_norm = (x - this_mean) / this_std

    # the reference checks train_channel_mode UNCONDITIONALLY
    # (encoders.py:117-119): an STE-trained encoder transmits binarized codes
    # at eval too; its -test_channel_mode flag is parsed but never read.
    # We honor test_channel_mode only as an explicit eval-time override when
    # it differs from the default, preserving both surfaces.
    mode = cfg.train_channel_mode
    if not training and cfg.test_channel_mode != 'block_norm':
        mode = cfg.test_channel_mode
    if mode == 'block_norm_ste':
        x_norm = ste_quantize(x_norm, cfg.enc_value_limit, cfg.enc_quantize_level,
                              cfg.enc_grad_limit, cfg.enc_clipping)

    if cfg.enc_truncate_limit > 0:
        x_norm = jnp.clip(x_norm, -cfg.enc_truncate_limit, cfg.enc_truncate_limit)

    return x_norm, stats
