"""Metrics: BER / BLER / positional BER / code power / SNR conversions.

Pure-jnp ports of the reference metrics (reference: utils.py:6-76), written as
jit-friendly functions that return device scalars. Under a sharded batch the
reductions compile to psum collectives automatically (GSPMD).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def errors_ber(y_true, y_pred) -> jnp.ndarray:
    """Bit error rate: mean disagreement of rounded bits (reference utils.py:6-18)."""
    t = jnp.round(y_true.reshape(y_true.shape[0], -1))
    p = jnp.round(y_pred.reshape(y_pred.shape[0], -1))
    return jnp.mean(jnp.not_equal(t, p).astype(jnp.float32))


def errors_ber_punctured(y_true, y_pred, punc_mask) -> jnp.ndarray:
    """BER with punctured positions zeroed out (reference utils.py:11-17).

    punc_mask: (block_len,) float mask — 0.0 at punctured positions, 1.0 else.
    Reference semantics: per-position mean error, zero the punctured entries,
    then mean over positions (including the zeros).
    """
    t = jnp.round(y_true.reshape(y_true.shape[0], -1))
    p = jnp.round(y_pred.reshape(y_pred.shape[0], -1))
    pos_err = jnp.mean(jnp.not_equal(t, p).astype(jnp.float32), axis=0)
    return jnp.mean(pos_err * punc_mask)


def errors_ber_list(y_true, y_pred) -> jnp.ndarray:
    """Per-block BER (reference utils.py:20-28)."""
    block_len = y_true.shape[1]
    t = jnp.round(y_true.reshape(y_true.shape[0], -1))
    p = jnp.round(y_pred.reshape(y_pred.shape[0], -1))
    return jnp.sum(jnp.not_equal(t, p), axis=1).astype(jnp.float32) / block_len


def errors_ber_pos(y_true, y_pred) -> jnp.ndarray:
    """Positional BER: per-time-step error rate over the batch (reference utils.py:31-39)."""
    t = jnp.round(y_true.reshape(y_true.shape[0], -1))
    p = jnp.round(y_pred.reshape(y_pred.shape[0], -1))
    return jnp.mean(jnp.not_equal(t, p).astype(jnp.float32), axis=0)


def code_power(codes) -> jnp.ndarray:
    """Per-position mean |code|^2, averaged over channels then batch (reference utils.py:41-47)."""
    pw = jnp.abs(codes) ** 2
    return jnp.mean(jnp.mean(pw, axis=2), axis=0)


def errors_bler(y_true, y_pred, punc_mask=None) -> jnp.ndarray:
    """Block error rate: fraction of blocks with >=1 bit error (reference utils.py:49-66)."""
    t = jnp.round(y_true.reshape(y_true.shape[0], -1))
    p = jnp.round(y_pred.reshape(y_pred.shape[0], -1))
    err = jnp.abs(t - p)
    if punc_mask is not None:
        err = err * punc_mask[None, :]
    return jnp.mean((jnp.sum(err, axis=1) > 0).astype(jnp.float32))


def snr_db2sigma(snr_db):
    """sigma = 10^(-snr/20) (reference utils.py:69-70)."""
    if isinstance(snr_db, (float, int)):
        return 10 ** (-snr_db / 20.0)
    return 10.0 ** (-jnp.asarray(snr_db) / 20.0)


def snr_sigma2db(sigma):
    """snr = -20 log10(sigma) (reference utils.py:72-76)."""
    if isinstance(sigma, (float, int)):
        return -20.0 * np.log10(sigma)
    return -20.0 * jnp.log10(jnp.asarray(sigma))
