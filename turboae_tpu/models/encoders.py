"""Trainable encoders — the full reference encoder zoo, TPU-native.

Reference: encoders.py:63-801. Every encoder is a pair of pure functions
  init(key, cfg)                      -> params pytree
  apply(params, cfg, x, perms, ...)   -> (codes, norm_stats)
with x: (B, L, k) float bits in {0,1} and codes: (B, L, n).

perms is a dict of device int arrays: {'p1': ..., 'p2': ...} (forward
permutations; inverses are derived where needed). Permutations are built
host-side from MT19937 (see ops/interleave.rand_perm) — the bit-exactness
contract with the reference (commpy interleavers.py:77-82).

Layout note: tensors stay (B, L, C) feature-last throughout — no
transpose-sandwiches around convs like the torch reference (cnn_utils.py:37-45);
XLA keeps everything fused in the TPU-preferred minor-most-features layout.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops import conv1d as cv
from ..ops import gru as rnn
from ..ops.activations import activation
from ..ops.interleave import interleave
from ..ops.power import power_constraint

Params = Any


def _dtype(cfg):
    return jnp.bfloat16 if cfg.dtype == 'bfloat16' else jnp.float32


def _branch_init(key, cfg, dense: bool):
    """One encoder branch: conv stack + Linear(out->1) (encoders.py:313-335)."""
    k1, k2 = jax.random.split(key)
    init = cv.dense_stack_init if dense else cv.stack_init
    return {
        'cnn': init(k1, cfg.enc_num_layer, cfg.code_rate_k, cfg.enc_num_unit,
                    cfg.enc_kernel_size),
        'lin': cv.linear_init(k2, cfg.enc_num_unit, 1),
    }


def _branch_apply(p, cfg, x, dense: bool):
    dt = _dtype(cfg)
    act = activation(cfg.enc_act)
    if dense:
        h = cv.dense_stack_apply(p['cnn'], x, compute_dtype=dt)
    else:
        h = cv.stack_apply(p['cnn'], x, compute_dtype=dt)
    return act(cv.linear_apply(p['lin'], h, compute_dtype=dt))


# ------------------------------------------------------------------
# ENC_interCNN — the flagship rate-1/3 interleaved CNN encoder
# (reference encoders.py:306-377); dense variant selects DenseSameShapeConv1d.
# ------------------------------------------------------------------

def intercnn_init(key, cfg) -> Params:
    dense = cfg.encoder != 'TurboAE_rate3_cnn'
    k1, k2, k3 = jax.random.split(key, 3)
    return {'b1': _branch_init(k1, cfg, dense),
            'b2': _branch_init(k2, cfg, dense),
            'b3': _branch_init(k3, cfg, dense)}


def intercnn_apply(params, cfg, x, perms, training=True, stats=None):
    dense = cfg.encoder != 'TurboAE_rate3_cnn'
    x = 2.0 * x - 1.0                       # BPSK map (encoders.py:362)
    x_sys = _branch_apply(params['b1'], cfg, x, dense)
    x_p1 = _branch_apply(params['b2'], cfg, x, dense)
    x_int = interleave(x, perms['p1'])
    x_p2 = _branch_apply(params['b3'], cfg, x_int, dense)
    x_tx = jnp.concatenate([x_sys, x_p1, x_p2], axis=2)
    return power_constraint(x_tx, cfg, training, stats)


# ------------------------------------------------------------------
# ENC_interCNN2Int — two-interleaver variant (encoders.py:383-442)
# ------------------------------------------------------------------

def intercnn2int_init(key, cfg) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    # NOTE: reference uses dec_kernel_size here (encoders.py:392) — preserved.
    def branch(k):
        ka, kb = jax.random.split(k)
        return {'cnn': cv.stack_init(ka, cfg.enc_num_layer, cfg.code_rate_k,
                                     cfg.enc_num_unit, cfg.dec_kernel_size),
                'lin': cv.linear_init(kb, cfg.enc_num_unit, 1)}
    return {'b1': branch(k1), 'b2': branch(k2), 'b3': branch(k3)}


def intercnn2int_apply(params, cfg, x, perms, training=True, stats=None):
    dt = _dtype(cfg)
    act = activation(cfg.enc_act)
    x = 2.0 * x - 1.0
    def branch(p, inp):
        return act(cv.linear_apply(p['lin'], cv.stack_apply(p['cnn'], inp, compute_dtype=dt),
                                   compute_dtype=dt))
    x_sys = branch(params['b1'], x)
    x_p1 = branch(params['b2'], interleave(x, perms['p1']))
    x_p2 = branch(params['b3'], interleave(x, perms['p2']))
    x_tx = jnp.concatenate([x_sys, x_p1, x_p2], axis=2)
    return power_constraint(x_tx, cfg, training, stats)


# ------------------------------------------------------------------
# ENC_turbofy_rate2_CNN — rate 1/2 CNN (encoders.py:448-494)
# ------------------------------------------------------------------

def rate2cnn_init(key, cfg) -> Params:
    k1, k2 = jax.random.split(key)
    def branch(k):
        ka, kb = jax.random.split(k)
        return {'cnn': cv.stack_init(ka, cfg.enc_num_layer, cfg.code_rate_k,
                                     cfg.enc_num_unit, cfg.dec_kernel_size),
                'lin': cv.linear_init(kb, cfg.enc_num_unit, 1)}
    return {'b1': branch(k1), 'b2': branch(k2)}


def rate2cnn_apply(params, cfg, x, perms, training=True, stats=None):
    dt = _dtype(cfg)
    act = activation(cfg.enc_act)
    x = 2.0 * x - 1.0
    def branch(p, inp):
        return act(cv.linear_apply(p['lin'], cv.stack_apply(p['cnn'], inp, compute_dtype=dt),
                                   compute_dtype=dt))
    x_sys = branch(params['b1'], x)
    x_p2 = branch(params['b2'], interleave(x, perms['p1']))
    x_tx = jnp.concatenate([x_sys, x_p2], axis=2)
    return power_constraint(x_tx, cfg, training, stats)


# ------------------------------------------------------------------
# CNN_encoder_rate3 / rate2 — no-interleaver CNN encoders (encoders.py:648-749)
# ------------------------------------------------------------------

def cnn_rate3_init(key, cfg) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    def branch(k):
        ka, kb = jax.random.split(k)
        return {'cnn': cv.stack_init(ka, cfg.enc_num_layer, cfg.code_rate_k,
                                     cfg.enc_num_unit, cfg.dec_kernel_size),
                'lin': cv.linear_init(kb, cfg.enc_num_unit, 1)}
    return {'b1': branch(k1), 'b2': branch(k2), 'b3': branch(k3)}


def cnn_rate3_apply(params, cfg, x, perms, training=True, stats=None):
    dt = _dtype(cfg)
    act = activation(cfg.enc_act)
    x = 2.0 * x - 1.0
    outs = []
    for name in ('b1', 'b2', 'b3'):
        p = params[name]
        outs.append(act(cv.linear_apply(p['lin'],
                                        cv.stack_apply(p['cnn'], x, compute_dtype=dt),
                                        compute_dtype=dt)))
    return power_constraint(jnp.concatenate(outs, axis=2), cfg, training, stats)


def cnn_rate2_init(key, cfg) -> Params:
    k1, k2 = jax.random.split(key)
    def branch(k):
        ka, kb = jax.random.split(k)
        return {'cnn': cv.stack_init(ka, cfg.enc_num_layer, cfg.code_rate_k,
                                     cfg.enc_num_unit, cfg.dec_kernel_size),
                'lin': cv.linear_init(kb, cfg.enc_num_unit, 1)}
    return {'b1': branch(k1), 'b2': branch(k2)}


def cnn_rate2_apply(params, cfg, x, perms, training=True, stats=None):
    dt = _dtype(cfg)
    act = activation(cfg.enc_act)
    x = 2.0 * x - 1.0
    outs = []
    for name in ('b1', 'b2'):
        p = params[name]
        outs.append(act(cv.linear_apply(p['lin'],
                                        cv.stack_apply(p['cnn'], x, compute_dtype=dt),
                                        compute_dtype=dt)))
    return power_constraint(jnp.concatenate(outs, axis=2), cfg, training, stats)


# ------------------------------------------------------------------
# RNN encoders (encoders.py:128-298)
# ------------------------------------------------------------------

def _rnn_branch_init(key, cfg):
    k1, k2 = jax.random.split(key)
    return {'rnn': rnn.birnn_init(k1, cfg.code_rate_k, cfg.enc_num_unit,
                                  cfg.enc_num_layer, cfg.enc_rnn),
            'lin': cv.linear_init(k2, 2 * cfg.enc_num_unit, 1)}


def _rnn_branch_apply(p, cfg, x):
    dt = _dtype(cfg)
    act = activation(cfg.enc_act)
    h = rnn.birnn_apply(p['rnn'], x, cfg.enc_rnn, compute_dtype=dt)
    return act(cv.linear_apply(p['lin'], h, compute_dtype=dt))


def interrnn_init(key, cfg) -> Params:
    """ENC_interRNN: 3 bidirectional RNN branches (encoders.py:231-298)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {'b1': _rnn_branch_init(k1, cfg), 'b2': _rnn_branch_init(k2, cfg),
            'b3': _rnn_branch_init(k3, cfg)}


def interrnn_apply(params, cfg, x, perms, training=True, stats=None):
    # NOTE: reference feeds RAW bits (no BPSK map) to the RNN encoder
    # (encoders.py:282-295) — preserved.
    x_sys = _rnn_branch_apply(params['b1'], cfg, x)
    x_p1 = _rnn_branch_apply(params['b2'], cfg, x)
    x_p2 = _rnn_branch_apply(params['b3'], cfg, interleave(x, perms['p1']))
    x_tx = jnp.concatenate([x_sys, x_p1, x_p2], axis=2)
    return power_constraint(x_tx, cfg, training, stats)


def interrnn_sys_init(key, cfg) -> Params:
    """ENC_interRNN_sys: hard systematic bit + 2 RNN parity branches
    (encoders.py:176-226)."""
    k1, k2 = jax.random.split(key)
    return {'b1': _rnn_branch_init(k1, cfg), 'b2': _rnn_branch_init(k2, cfg)}


def interrnn_sys_apply(params, cfg, x, perms, training=True, stats=None):
    x_sys = 2.0 * x - 1.0
    x_p1 = _rnn_branch_apply(params['b1'], cfg, x)
    x_p2 = _rnn_branch_apply(params['b2'], cfg, interleave(x, perms['p1']))
    x_tx = jnp.concatenate([x_p1, x_p2], axis=2)
    x_tx, stats = power_constraint(x_tx, cfg, training, stats)
    return jnp.concatenate([x_sys, x_tx], axis=2), stats


def rate2rnn_init(key, cfg) -> Params:
    """ENC_turbofy_rate2 (encoders.py:128-171) — always GRU in the reference."""
    k1, k2 = jax.random.split(key)
    def branch(k):
        ka, kb = jax.random.split(k)
        return {'rnn': rnn.bigru_init(ka, cfg.code_rate_k, cfg.enc_num_unit,
                                      cfg.enc_num_layer),
                'lin': cv.linear_init(kb, 2 * cfg.enc_num_unit, 1)}
    return {'b1': branch(k1), 'b2': branch(k2)}


def rate2rnn_apply(params, cfg, x, perms, training=True, stats=None):
    dt = _dtype(cfg)
    act = activation(cfg.enc_act)
    def branch(p, inp):
        return act(cv.linear_apply(p['lin'], rnn.bigru_apply(p['rnn'], inp, compute_dtype=dt),
                                   compute_dtype=dt))
    x_sys = branch(params['b1'], x)
    x_p2 = branch(params['b2'], interleave(x, perms['p1']))
    x_tx = jnp.concatenate([x_sys, x_p2], axis=2)
    return power_constraint(x_tx, cfg, training, stats)


# ------------------------------------------------------------------
# 2D CNN encoders (encoders.py:505-640): block is reshaped to an
# (img, img) image, convs are 2D, interleaver permutes flattened pixels.
# ------------------------------------------------------------------

def _img(cfg):
    # cfg.img_size, like the decoders and the reference (-img_size flag,
    # get_args.py:128) — NOT derived from block_len, which need not be square
    return cfg.img_size


def cnn2d_branch_init(key, cfg, dense: bool):
    k1, k2 = jax.random.split(key)
    init = cv.dense_stack2d_init if dense else cv.stack2d_init
    return {'cnn': init(k1, cfg.enc_num_layer, cfg.code_rate_k, cfg.enc_num_unit,
                        cfg.enc_kernel_size),
            'lin': cv.conv2d_init(k2, cfg.enc_num_unit, 1, 1)}


def intercnn2d_init(key, cfg) -> Params:
    dense = cfg.encoder == 'TurboAE_rate3_cnn2d_dense'
    ks = jax.random.split(key, 3)
    return {f'b{i+1}': cnn2d_branch_init(ks[i], cfg, dense) for i in range(3)}


def _to_img(cfg, x):
    """(B, L, k) -> (B, H, W, k) image layout (feature-last on TPU)."""
    s = _img(cfg)
    b = x.shape[0]
    return x.reshape(b, s, s, x.shape[2])


def _from_img(cfg, x):
    b = x.shape[0]
    return x.reshape(b, cfg.block_len, x.shape[3])


def intercnn2d_apply(params, cfg, x, perms, training=True, stats=None):
    """ENC_interCNN2D (encoders.py:505-571): branch 3 sees the pixel-interleaved
    image."""
    dense = cfg.encoder == 'TurboAE_rate3_cnn2d_dense'
    dt = _dtype(cfg)
    img = _to_img(cfg, 2.0 * x - 1.0)  # (B, H, W, k)
    stackf = cv.dense_stack2d_apply if dense else cv.stack2d_apply

    def branch(p, inp):
        h = stackf(p['cnn'], inp, compute_dtype=dt)
        return cv.conv2d_apply(p['lin'], h, compute_dtype=dt)  # no act (encoders.py:520)

    x_sys = branch(params['b1'], img)
    x_p1 = branch(params['b2'], img)
    # interleave flattened pixels; interleave_2d expects (B, C, H, W)
    img_chw = jnp.transpose(img, (0, 3, 1, 2))
    from ..ops.interleave import interleave_2d as i2d
    img_int = jnp.transpose(i2d(img_chw, perms['p1']), (0, 2, 3, 1))
    x_p2 = branch(params['b3'], img_int)

    x_tx = jnp.concatenate([x_sys, x_p1, x_p2], axis=3)  # (B,H,W,3)
    x_tx = _from_img(cfg, x_tx)
    return power_constraint(x_tx, cfg, training, stats)


def cnn2d_init(key, cfg) -> Params:
    """ENC_CNN2D — no interleaver (encoders.py:581-640)."""
    return intercnn2d_init(key, cfg)


def cnn2d_apply(params, cfg, x, perms, training=True, stats=None):
    dense = cfg.encoder == 'TurboAE_rate3_cnn2d_dense'
    dt = _dtype(cfg)
    act = activation(cfg.enc_act)
    img = _to_img(cfg, 2.0 * x - 1.0)
    stackf = cv.dense_stack2d_apply if dense else cv.stack2d_apply

    def branch(p, inp):
        h = stackf(p['cnn'], inp, compute_dtype=dt)
        return act(cv.conv2d_apply(p['lin'], h, compute_dtype=dt))

    outs = [branch(params[f'b{i+1}'], img) for i in range(3)]
    x_tx = _from_img(cfg, jnp.concatenate(outs, axis=3))
    return power_constraint(x_tx, cfg, training, stats)


# ------------------------------------------------------------------
# Registry
# ------------------------------------------------------------------

ENC_REGISTRY: Dict[str, Any] = {
    'TurboAE_rate3_cnn': (intercnn_init, intercnn_apply),
    'TurboAE_rate3_cnn_dense': (intercnn_init, intercnn_apply),
    'Turboae_rate3_rnn': (interrnn_init, interrnn_apply),
    'TurboAE_rate3_rnn_sys': (interrnn_sys_init, interrnn_sys_apply),
    'TurboAE_rate2_rnn': (rate2rnn_init, rate2rnn_apply),
    'TurboAE_rate2_cnn': (rate2cnn_init, rate2cnn_apply),
    'rate3_cnn': (cnn_rate3_init, cnn_rate3_apply),
    'rate2_cnn': (cnn_rate2_init, cnn_rate2_apply),
    'turboae_2int': (intercnn2int_init, intercnn2int_apply),
    'TurboAE_rate3_cnn2d': (intercnn2d_init, intercnn2d_apply),
    'TurboAE_rate3_cnn2d_dense': (intercnn2d_init, intercnn2d_apply),
    'rate3_cnn2d': (cnn2d_init, cnn2d_apply),
}


def make_encoder(cfg):
    """Return (init, apply) for cfg.encoder (registry mirror of main.py:29-65).

    'Turbo_rate3_757'/'Turbo_rate3_lte' (fixed classical encoders for DeepTurbo)
    live in models/deepturbo.py since they are host/numpy hybrids.
    """
    if cfg.encoder in ('Turbo_rate3_757', 'Turbo_rate3_lte'):
        from .deepturbo import turbo_enc_init, turbo_enc_apply
        return turbo_enc_init, turbo_enc_apply
    if cfg.encoder not in ENC_REGISTRY:
        raise ValueError(f'unknown encoder {cfg.encoder}')
    return ENC_REGISTRY[cfg.encoder]
