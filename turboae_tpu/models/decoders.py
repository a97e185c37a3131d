"""Iterative neural turbo decoders — TPU-native.

Reference: decoders.py. The flagship DEC_LargeCNN (decoders.py:157-269) keeps
`num_iteration` separate weight sets in ModuleLists and unrolls a Python loop.
Here the per-iteration weights are STACKED on a leading axis and the iteration
loop is a single lax.scan — one compiled loop body instead of 12 unrolled conv
stacks, which cuts XLA compile time ~6x and keeps the program small. The final
iteration differs only in dec2's output head (num_iter_ft -> 1), so it is
peeled: scan covers iterations 0..num_iteration-2, the last runs once after.

Signature convention (same as encoders):
  init(key, cfg) -> params
  apply(params, cfg, received, perms) -> (B, L, k) sigmoid bit estimates
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import conv1d as cv
from ..ops import gru as rnn
from ..ops.activations import activation


Params = Any


def _dtype(cfg):
    return jnp.bfloat16 if cfg.dtype == 'bfloat16' else jnp.float32


def _stack_iters(per_iter):
    """Stack a list of identically-shaped pytrees on a new leading axis.
    Empty list (num_iteration == 1: everything is in the peeled final
    iteration) -> None; apply fns skip the scan in that case."""
    if not per_iter:
        return None
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_iter)


def _perm_pair(perms, name='p1'):
    p = jnp.asarray(perms[name])
    inv = jnp.zeros_like(p).at[p].set(jnp.arange(p.shape[0]))
    return p, inv


# ------------------------------------------------------------------
# DEC_LargeCNN — flagship (decoders.py:157-269); dense variant shares code.
# ------------------------------------------------------------------

def largecnn_init(key, cfg) -> Params:
    # reference keys the conv flavor off the ENCODER name
    # (decoders.py:172-176): plain convs ONLY for
    # encoder == 'TurboAE_rate3_cnn', dense for everything else
    # (including DeepTurbo's fixed classical encoders)
    dense = cfg.encoder != 'TurboAE_rate3_cnn'
    cnn_init = cv.dense_stack_init if dense else cv.stack_init
    n_in = 2 + cfg.num_iter_ft
    it = cfg.num_iteration
    keys = jax.random.split(key, 4 * it + 1)

    dec1_cnn, dec2_cnn, dec1_lin, dec2_lin = [], [], [], []
    for i in range(it):
        dec1_cnn.append(cnn_init(keys[4 * i], cfg.dec_num_layer, n_in,
                                 cfg.dec_num_unit, cfg.dec_kernel_size))
        dec2_cnn.append(cnn_init(keys[4 * i + 1], cfg.dec_num_layer, n_in,
                                 cfg.dec_num_unit, cfg.dec_kernel_size))
        dec1_lin.append(cv.linear_init(keys[4 * i + 2], cfg.dec_num_unit, cfg.num_iter_ft))
        if i == it - 1:
            final_lin = cv.linear_init(keys[4 * i + 3], cfg.dec_num_unit, 1)
        else:
            dec2_lin.append(cv.linear_init(keys[4 * i + 3], cfg.dec_num_unit, cfg.num_iter_ft))

    return {
        # scanned weights: iterations 0..it-2
        'scan': {
            'dec1_cnn': _stack_iters(dec1_cnn[:-1]),
            'dec2_cnn': _stack_iters(dec2_cnn[:-1]),
            'dec1_lin': _stack_iters(dec1_lin[:-1]),
            'dec2_lin': _stack_iters(dec2_lin),
        },
        # peeled final iteration
        'final': {
            'dec1_cnn': dec1_cnn[-1],
            'dec2_cnn': dec2_cnn[-1],
            'dec1_lin': dec1_lin[-1],
            'dec2_lin': final_lin,
        },
    }


def largecnn_apply(params, cfg, received, perms, key=None, training=False) -> jnp.ndarray:
    dense = cfg.encoder != 'TurboAE_rate3_cnn'  # see largecnn_init
    dt = _dtype(cfg)
    stackf = cv.dense_stack_apply if dense else cv.stack_apply
    if cfg.use_fused_conv and not dense:
        # Pallas fused stack: whole 5-layer stack in one kernel, activations
        # VMEM-resident, bf16 im2col matmuls (kernels/conv_stack.py)
        from ..kernels.conv_stack import fused_stack_apply_bf16
        stackf = lambda w, x, compute_dtype=None: \
            fused_stack_apply_bf16(w, x).astype(dt)
    p, inv = _perm_pair(perms)

    r_sys = received[:, :, 0:1]
    r_par1 = received[:, :, 1:2]
    r_par2 = received[:, :, 2:3]
    r_sys_int = jnp.take(r_sys, p, axis=1)

    b, l, _ = received.shape
    prior0 = jnp.zeros((b, l, cfg.num_iter_ft), jnp.float32)

    def half_iter(w_cnn, w_lin, inputs, sub):
        h = stackf(w_cnn, inputs, compute_dtype=dt)
        # raw Linear: the reference applies dec_act only in DEC_LargeRNN
        # (decoders.py:103); every CNN decoder head is unactivated
        x_plr = cv.linear_apply(w_lin, h, compute_dtype=dt)
        if cfg.extrinsic:
            x_plr = x_plr - sub        # extrinsic subtraction (decoders.py:235-247)
        return x_plr

    def body(prior, w):
        x_plr = half_iter(w['dec1_cnn'], w['dec1_lin'],
                          jnp.concatenate([r_sys, r_par1, prior], axis=2), prior)
        x_plr_int = jnp.take(x_plr, p, axis=1)
        x_plr2 = half_iter(w['dec2_cnn'], w['dec2_lin'],
                           jnp.concatenate([r_sys_int, r_par2, x_plr_int], axis=2),
                           x_plr_int)
        return jnp.take(x_plr2, inv, axis=1), None

    if cfg.num_iteration > 1:
        prior, _ = lax.scan(body, prior0, params['scan'],
                            unroll=max(1, cfg.scan_unroll))
    else:
        prior = prior0  # num_iteration == 1: only the peeled final iteration

    # final iteration (decoders.py:251-267): dec2 head emits 1 channel
    fw = params['final']
    x_plr = half_iter(fw['dec1_cnn'], fw['dec1_lin'],
                      jnp.concatenate([r_sys, r_par1, prior], axis=2), prior)
    x_plr_int = jnp.take(x_plr, p, axis=1)
    h = stackf(fw['dec2_cnn'],
               jnp.concatenate([r_sys_int, r_par2, x_plr_int], axis=2),
               compute_dtype=dt)
    logit = cv.linear_apply(fw['dec2_lin'], h, compute_dtype=dt)
    return jax.nn.sigmoid(jnp.take(logit, inv, axis=1))


# ------------------------------------------------------------------
# DEC_LargeRNN (decoders.py:16-149)
# ------------------------------------------------------------------

def largernn_init(key, cfg) -> Params:
    n_in = 2 + cfg.num_iter_ft
    it = cfg.num_iteration
    keys = jax.random.split(key, 4 * it)
    d1r, d2r, d1l, d2l = [], [], [], []
    for i in range(it):
        d1r.append(rnn.birnn_init(keys[4 * i], n_in, cfg.dec_num_unit, 2, cfg.dec_rnn))
        d2r.append(rnn.birnn_init(keys[4 * i + 1], n_in, cfg.dec_num_unit, 2, cfg.dec_rnn))
        d1l.append(cv.linear_init(keys[4 * i + 2], 2 * cfg.dec_num_unit, cfg.num_iter_ft))
        if i == it - 1:
            final_lin = cv.linear_init(keys[4 * i + 3], 2 * cfg.dec_num_unit, 1)
        else:
            d2l.append(cv.linear_init(keys[4 * i + 3], 2 * cfg.dec_num_unit, cfg.num_iter_ft))
    return {
        'scan': {'dec1_rnn': _stack_iters(d1r[:-1]), 'dec2_rnn': _stack_iters(d2r[:-1]),
                 'dec1_lin': _stack_iters(d1l[:-1]), 'dec2_lin': _stack_iters(d2l)},
        'final': {'dec1_rnn': d1r[-1], 'dec2_rnn': d2r[-1],
                  'dec1_lin': d1l[-1], 'dec2_lin': final_lin},
    }


def largernn_apply(params, cfg, received, perms, key=None, training=False) -> jnp.ndarray:
    dt = _dtype(cfg)
    act = activation(cfg.dec_act)
    p, inv = _perm_pair(perms)

    r_sys = received[:, :, 0:1]
    r_par1 = received[:, :, 1:2]
    r_par2 = received[:, :, 2:3]
    r_sys_int = jnp.take(r_sys, p, axis=1)

    b, l, _ = received.shape
    prior0 = jnp.zeros((b, l, cfg.num_iter_ft), jnp.float32)

    use_dropout = training and cfg.dropout > 0 and key is not None

    def maybe_dropout(x, k):
        # reference: x_plr = dec_act(dropout(linear(...))) (decoders.py:103)
        if not use_dropout:
            return x
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(k, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)

    def half_iter(w_rnn, w_lin, inputs, sub, dk):
        # torch GRU/LSTM inter-layer dropout (reference decoders.py:44,49)
        # plus the head dropout (decoders.py:103); distinct folded keys
        h = rnn.birnn_apply(w_rnn, inputs, cfg.dec_rnn, compute_dtype=dt,
                            dropout=cfg.dropout if use_dropout else 0.0,
                            key=jax.random.fold_in(dk, 1 << 20)
                            if use_dropout else None)
        x_plr = act(maybe_dropout(cv.linear_apply(w_lin, h, compute_dtype=dt), dk))
        if cfg.extrinsic:
            x_plr = x_plr - sub
        return x_plr

    base_key = key if key is not None else jax.random.PRNGKey(0)

    def body(prior, xs):
        w, idx = xs
        k1 = jax.random.fold_in(base_key, 2 * idx)
        k2 = jax.random.fold_in(base_key, 2 * idx + 1)
        x_plr = half_iter(w['dec1_rnn'], w['dec1_lin'],
                          jnp.concatenate([r_sys, r_par1, prior], axis=2), prior, k1)
        x_plr_int = jnp.take(x_plr, p, axis=1)
        x_plr2 = half_iter(w['dec2_rnn'], w['dec2_lin'],
                           jnp.concatenate([r_sys_int, r_par2, x_plr_int], axis=2),
                           x_plr_int, k2)
        return jnp.take(x_plr2, inv, axis=1), None

    n_scan = cfg.num_iteration - 1
    if n_scan > 0:
        prior, _ = lax.scan(body, prior0, (params['scan'], jnp.arange(n_scan)))
    else:
        prior = prior0

    fw = params['final']
    k1 = jax.random.fold_in(base_key, 2 * n_scan)
    k2 = jax.random.fold_in(base_key, 2 * n_scan + 1)
    x_plr = half_iter(fw['dec1_rnn'], fw['dec1_lin'],
                      jnp.concatenate([r_sys, r_par1, prior], axis=2), prior, k1)
    x_plr_int = jnp.take(x_plr, p, axis=1)
    h = rnn.birnn_apply(fw['dec2_rnn'],
                        jnp.concatenate([r_sys_int, r_par2, x_plr_int], axis=2),
                        cfg.dec_rnn, compute_dtype=dt)
    logit = act(maybe_dropout(cv.linear_apply(fw['dec2_lin'], h, compute_dtype=dt), k2))
    return jax.nn.sigmoid(jnp.take(logit, inv, axis=1))


# ------------------------------------------------------------------
# DEC_LargeCNN2Int — two-interleaver decoder (decoders.py:279-381)
# ------------------------------------------------------------------

def largecnn2int_init(key, cfg) -> Params:
    # always plain convs (reference 2Int imports only SameShapeConv1d,
    # decoders.py:278); dense selection keys off encoder in largecnn_init
    return largecnn_init(key, cfg.replace(encoder='TurboAE_rate3_cnn'))


def largecnn2int_apply(params, cfg, received, perms, key=None, training=False) -> jnp.ndarray:
    dt = _dtype(cfg)
    p1, inv1 = _perm_pair(perms, 'p1')
    p2, inv2 = _perm_pair(perms, 'p2')

    r_sys = received[:, :, 0:1]
    r_par1 = received[:, :, 1:2]
    r_par2 = received[:, :, 2:3]
    r_sys_int1 = jnp.take(r_sys, p1, axis=1)
    r_sys_int2 = jnp.take(r_sys, p2, axis=1)

    b, l, _ = received.shape
    prior0 = jnp.zeros((b, l, cfg.num_iter_ft), jnp.float32)

    def half(w_cnn, w_lin, inputs, sub):
        h = cv.stack_apply(w_cnn, inputs, compute_dtype=dt)
        x = cv.linear_apply(w_lin, h, compute_dtype=dt)  # raw (no dec_act)
        if cfg.extrinsic:
            x = x - sub
        return x

    def body(prior, w):
        prior_i = jnp.take(prior, p1, axis=1)           # (decoders.py:338)
        x_plr = half(w['dec1_cnn'], w['dec1_lin'],
                     jnp.concatenate([r_sys_int1, r_par1, prior_i], axis=2), prior_i)
        x_int = jnp.take(jnp.take(x_plr, inv1, axis=1), p2, axis=1)
        x_plr2 = half(w['dec2_cnn'], w['dec2_lin'],
                      jnp.concatenate([r_sys_int2, r_par2, x_int], axis=2), x_int)
        return jnp.take(x_plr2, inv2, axis=1), None

    if cfg.num_iteration > 1:
        prior, _ = lax.scan(body, prior0, params['scan'])
    else:
        prior = prior0  # num_iteration == 1: only the peeled final iteration

    fw = params['final']
    prior_i = jnp.take(prior, p1, axis=1)
    x_plr = half(fw['dec1_cnn'], fw['dec1_lin'],
                 jnp.concatenate([r_sys_int1, r_par1, prior_i], axis=2), prior_i)
    x_int = jnp.take(jnp.take(x_plr, inv1, axis=1), p2, axis=1)
    h = cv.stack_apply(fw['dec2_cnn'],
                       jnp.concatenate([r_sys_int2, r_par2, x_int], axis=2),
                       compute_dtype=dt)
    logit = cv.linear_apply(fw['dec2_lin'], h, compute_dtype=dt)
    return jax.nn.sigmoid(jnp.take(logit, inv2, axis=1))


# ------------------------------------------------------------------
# DEC_LargeCNN_rate2 (decoders.py:634-728) / DEC_LargeRNN_rate2 (:541-629)
# ------------------------------------------------------------------

def largecnn_rate2_init(key, cfg) -> Params:
    # always plain convs (reference rate2 decoder hard-codes SameShapeConv1d,
    # decoders.py:651-655)
    return largecnn_init(key, cfg.replace(encoder='TurboAE_rate3_cnn'))


def largecnn_rate2_apply(params, cfg, received, perms, key=None, training=False) -> jnp.ndarray:
    dt = _dtype(cfg)
    p, inv = _perm_pair(perms)

    r_sys = received[:, :, 0:1]
    r_par = received[:, :, 1:2]
    r_sys_int = jnp.take(r_sys, p, axis=1)
    r_par_deint = jnp.take(r_par, inv, axis=1)

    b, l, _ = received.shape
    prior0 = jnp.zeros((b, l, cfg.num_iter_ft), jnp.float32)

    def half(w_cnn, w_lin, inputs, sub):
        h = cv.stack_apply(w_cnn, inputs, compute_dtype=dt)
        x = cv.linear_apply(w_lin, h, compute_dtype=dt)  # raw (no dec_act)
        if cfg.extrinsic:
            x = x - sub
        return x

    def body(prior, w):
        x_plr = half(w['dec1_cnn'], w['dec1_lin'],
                     jnp.concatenate([r_sys, r_par_deint, prior], axis=2), prior)
        x_int = jnp.take(x_plr, p, axis=1)
        x_plr2 = half(w['dec2_cnn'], w['dec2_lin'],
                      jnp.concatenate([r_sys_int, r_par, x_int], axis=2), x_int)
        return jnp.take(x_plr2, inv, axis=1), None

    if cfg.num_iteration > 1:
        prior, _ = lax.scan(body, prior0, params['scan'])
    else:
        prior = prior0  # num_iteration == 1: only the peeled final iteration

    fw = params['final']
    x_plr = half(fw['dec1_cnn'], fw['dec1_lin'],
                 jnp.concatenate([r_sys, r_par_deint, prior], axis=2), prior)
    x_int = jnp.take(x_plr, p, axis=1)
    h = cv.stack_apply(fw['dec2_cnn'],
                       jnp.concatenate([r_sys_int, r_par, x_int], axis=2),
                       compute_dtype=dt)
    logit = cv.linear_apply(fw['dec2_lin'], h, compute_dtype=dt)
    return jax.nn.sigmoid(jnp.take(logit, inv, axis=1))


def largernn_rate2_init(key, cfg) -> Params:
    """DEC_LargeRNN_rate2 (decoders.py:541-572): GRU input 1+ft features."""
    n_in = 1 + cfg.num_iter_ft
    it = cfg.num_iteration
    keys = jax.random.split(key, 4 * it)
    d1r, d2r, d1l, d2l = [], [], [], []
    for i in range(it):
        d1r.append(rnn.bigru_init(keys[4 * i], n_in, cfg.dec_num_unit, 2))
        d2r.append(rnn.bigru_init(keys[4 * i + 1], n_in, cfg.dec_num_unit, 2))
        d1l.append(cv.linear_init(keys[4 * i + 2], 2 * cfg.dec_num_unit, cfg.num_iter_ft))
        if i == it - 1:
            final_lin = cv.linear_init(keys[4 * i + 3], 2 * cfg.dec_num_unit, 1)
        else:
            d2l.append(cv.linear_init(keys[4 * i + 3], 2 * cfg.dec_num_unit, cfg.num_iter_ft))
    return {'scan': {'dec1_rnn': _stack_iters(d1r[:-1]), 'dec2_rnn': _stack_iters(d2r[:-1]),
                     'dec1_lin': _stack_iters(d1l[:-1]), 'dec2_lin': _stack_iters(d2l)},
            'final': {'dec1_rnn': d1r[-1], 'dec2_rnn': d2r[-1],
                      'dec1_lin': d1l[-1], 'dec2_lin': final_lin}}


def largernn_rate2_apply(params, cfg, received, perms, key=None, training=False) -> jnp.ndarray:
    dt = _dtype(cfg)
    p, inv = _perm_pair(perms)

    r_sys = received[:, :, 0:1]
    r_int = received[:, :, 1:2]

    b, l, _ = received.shape
    prior0 = jnp.zeros((b, l, cfg.num_iter_ft), jnp.float32)

    def half(w_rnn, w_lin, inputs, sub):
        h = rnn.bigru_apply(w_rnn, inputs, compute_dtype=dt)
        # raw Linear: reference rate2 RNN applies no dec_act
        # (decoders.py:597-627)
        x = cv.linear_apply(w_lin, h, compute_dtype=dt)
        if cfg.extrinsic:
            x = x - sub
        return x

    def body(prior, w):
        x_plr = half(w['dec1_rnn'], w['dec1_lin'],
                     jnp.concatenate([r_sys, prior], axis=2), prior)
        x_int = jnp.take(x_plr, p, axis=1)
        x_plr2 = half(w['dec2_rnn'], w['dec2_lin'],
                      jnp.concatenate([r_int, x_int], axis=2), x_int)
        return jnp.take(x_plr2, inv, axis=1), None

    if cfg.num_iteration > 1:
        prior, _ = lax.scan(body, prior0, params['scan'])
    else:
        prior = prior0  # num_iteration == 1: only the peeled final iteration

    fw = params['final']
    x_plr = half(fw['dec1_rnn'], fw['dec1_lin'],
                 jnp.concatenate([r_sys, prior], axis=2), prior)
    x_int = jnp.take(x_plr, p, axis=1)
    h = rnn.bigru_apply(fw['dec2_rnn'], jnp.concatenate([r_int, x_int], axis=2),
                        compute_dtype=dt)
    logit = cv.linear_apply(fw['dec2_lin'], h, compute_dtype=dt)
    return jax.nn.sigmoid(jnp.take(logit, inv, axis=1))


# ------------------------------------------------------------------
# CNN_decoder_rate3 — single-pass CNN (decoders.py:733-759)
# ------------------------------------------------------------------

def cnn_rate3_init(key, cfg) -> Params:
    k1, k2 = jax.random.split(key)
    return {'cnn': cv.stack_init(k1, cfg.dec_num_layer, cfg.code_rate_n,
                                 cfg.dec_num_unit, cfg.dec_kernel_size),
            'lin': cv.linear_init(k2, cfg.dec_num_unit, 1)}


def cnn_rate3_apply(params, cfg, received, perms, key=None, training=False) -> jnp.ndarray:
    dt = _dtype(cfg)
    h = cv.stack_apply(params['cnn'], received, compute_dtype=dt)
    return jax.nn.sigmoid(cv.linear_apply(params['lin'], h, compute_dtype=dt))


# ------------------------------------------------------------------
# NeuralTurbofyDec — weight-SHARED iterative GRU decoder (decoders.py:766-857)
# ------------------------------------------------------------------

def nbcjr_init(key, cfg) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    n_in = cfg.code_rate_n + cfg.num_iter_ft - 1
    return {'rnn': rnn.bigru_init(k1, n_in, cfg.dec_num_unit, 2),
            'out': cv.linear_init(k2, 2 * cfg.dec_num_unit, cfg.num_iter_ft),
            'final': cv.linear_init(k3, cfg.num_iter_ft, 1)}


def nbcjr_apply(params, cfg, received, perms, key=None, training=False) -> jnp.ndarray:
    dt = _dtype(cfg)
    p, inv = _perm_pair(perms)
    r_sys = received[:, :, 0:1]
    r_par1 = received[:, :, 1:2]
    r_par2 = received[:, :, 2:3]
    r_sys_int = jnp.take(r_sys, p, axis=1)

    b, l, _ = received.shape
    prior = jnp.zeros((b, l, cfg.num_iter_ft), jnp.float32)

    def half(inputs, sub):
        h = rnn.bigru_apply(params['rnn'], inputs, compute_dtype=dt)
        x = cv.linear_apply(params['out'], h, compute_dtype=dt)
        # NOTE reference subtracts when `not extrinsic` here (decoders.py:825) —
        # an inversion quirk of NeuralTurbofyDec, preserved.
        if not cfg.extrinsic:
            x = x - sub
        return x

    # weight-shared loop: same params every iteration -> fori_loop
    def body(i, prior):
        x_plr = half(jnp.concatenate([r_sys, r_par1, prior], axis=2), prior)
        x_int = jnp.take(x_plr, p, axis=1)
        x_plr2 = half(jnp.concatenate([r_sys_int, r_par2, x_int], axis=2), x_int)
        return jnp.take(x_plr2, inv, axis=1)

    prior = lax.fori_loop(0, cfg.num_iteration - 1, body, prior)

    x_plr = half(jnp.concatenate([r_sys, r_par1, prior], axis=2), prior)
    x_int = jnp.take(x_plr, p, axis=1)
    h = rnn.bigru_apply(params['rnn'],
                        jnp.concatenate([r_sys_int, r_par2, x_int], axis=2),
                        compute_dtype=dt)
    x_dec = cv.linear_apply(params['out'], h, compute_dtype=dt)
    x_final = jax.nn.sigmoid(cv.linear_apply(params['final'], x_dec, compute_dtype=dt))
    return jnp.take(x_final, inv, axis=1)


# ------------------------------------------------------------------
# 2D decoders (decoders.py:390-534)
# ------------------------------------------------------------------

def largecnn2d_init(key, cfg) -> Params:
    dense = cfg.encoder == 'TurboAE_rate3_cnn2d_dense'  # keyed off ENCODER (reference decoders.py:398,507)
    cnn_init = cv.dense_stack2d_init if dense else cv.stack2d_init
    n_in = 2 + cfg.num_iter_ft
    it = cfg.num_iteration
    keys = jax.random.split(key, 4 * it)
    d1c, d2c, d1o, d2o = [], [], [], []
    for i in range(it):
        d1c.append(cnn_init(keys[4 * i], cfg.dec_num_layer, n_in, cfg.dec_num_unit,
                            cfg.dec_kernel_size))
        d2c.append(cnn_init(keys[4 * i + 1], cfg.dec_num_layer, n_in, cfg.dec_num_unit,
                            cfg.dec_kernel_size))
        d1o.append(cnn_init(keys[4 * i + 2], 1, cfg.dec_num_unit, cfg.num_iter_ft, 1))
        if i == it - 1:
            final_o = cnn_init(keys[4 * i + 3], 1, cfg.dec_num_unit, 1, 1)
        else:
            d2o.append(cnn_init(keys[4 * i + 3], 1, cfg.dec_num_unit, cfg.num_iter_ft, 1))
    return {'scan': {'dec1_cnn': _stack_iters(d1c[:-1]), 'dec2_cnn': _stack_iters(d2c[:-1]),
                     'dec1_out': _stack_iters(d1o[:-1]), 'dec2_out': _stack_iters(d2o)},
            'final': {'dec1_cnn': d1c[-1], 'dec2_cnn': d2c[-1],
                      'dec1_out': d1o[-1], 'dec2_out': final_o}}


def largecnn2d_apply(params, cfg, received, perms, key=None, training=False) -> jnp.ndarray:
    dense = cfg.encoder == 'TurboAE_rate3_cnn2d_dense'  # keyed off ENCODER (reference decoders.py:398,507)
    dt = _dtype(cfg)
    stackf = cv.dense_stack2d_apply if dense else cv.stack2d_apply
    s = cfg.img_size
    b = received.shape[0]
    p = jnp.asarray(perms['p1'])
    inv = jnp.zeros_like(p).at[p].set(jnp.arange(p.shape[0]))

    img = received.reshape(b, s, s, cfg.code_rate_n)  # feature-last
    r_sys = img[..., 0:1]
    r_par1 = img[..., 1:2]
    r_par2 = img[..., 2:3]

    def pix_perm(x, idx):
        flat = x.reshape(b, s * s, x.shape[-1])
        return jnp.take(flat, idx, axis=1).reshape(b, s, s, x.shape[-1])

    r_sys_int = pix_perm(r_sys, p)
    prior0 = jnp.zeros((b, s, s, cfg.num_iter_ft), jnp.float32)

    def half(w_cnn, w_out, inputs, sub, final=False):
        h = stackf(w_cnn, inputs, compute_dtype=dt)
        x = stackf(w_out, h, no_act=final, compute_dtype=dt)
        if cfg.extrinsic:
            x = x - sub
        return x

    def body(prior, w):
        x_plr = half(w['dec1_cnn'], w['dec1_out'],
                     jnp.concatenate([r_sys, r_par1, prior], axis=3), prior)
        x_int = pix_perm(x_plr, p)
        x_plr2 = half(w['dec2_cnn'], w['dec2_out'],
                      jnp.concatenate([r_sys_int, r_par2, x_int], axis=3), x_int)
        return pix_perm(x_plr2, inv), None

    if cfg.num_iteration > 1:
        prior, _ = lax.scan(body, prior0, params['scan'])
    else:
        prior = prior0  # num_iteration == 1: only the peeled final iteration

    fw = params['final']
    x_plr = half(fw['dec1_cnn'], fw['dec1_out'],
                 jnp.concatenate([r_sys, r_par1, prior], axis=3), prior)
    x_int = pix_perm(x_plr, p)
    h = stackf(fw['dec2_cnn'],
               jnp.concatenate([r_sys_int, r_par2, x_int], axis=3), compute_dtype=dt)
    logit = stackf(fw['dec2_out'], h, no_act=True, compute_dtype=dt)
    out = jax.nn.sigmoid(pix_perm(logit, inv))
    return out.reshape(b, cfg.block_len, cfg.code_rate_k)


def cnn2d_init(key, cfg) -> Params:
    """DEC_CNN2D — no interleaver (decoders.py:498-534)."""
    dense = cfg.encoder == 'TurboAE_rate3_cnn2d_dense'  # keyed off ENCODER (reference decoders.py:398,507)
    cnn_init = cv.dense_stack2d_init if dense else cv.stack2d_init
    k1, k2 = jax.random.split(key)
    return {'dec': cnn_init(k1, cfg.dec_num_layer, cfg.code_rate_n,
                            cfg.dec_num_unit, cfg.dec_kernel_size),
            'out': cnn_init(k2, 1, cfg.dec_num_unit, 1, 1)}


def cnn2d_apply(params, cfg, received, perms, key=None, training=False) -> jnp.ndarray:
    dense = cfg.encoder == 'TurboAE_rate3_cnn2d_dense'  # keyed off ENCODER (reference decoders.py:398,507)
    dt = _dtype(cfg)
    stackf = cv.dense_stack2d_apply if dense else cv.stack2d_apply
    s = cfg.img_size
    b = received.shape[0]
    img = received.reshape(b, s, s, cfg.code_rate_n)
    h = stackf(params['dec'], img, compute_dtype=dt)
    x = stackf(params['out'], h, compute_dtype=dt)
    return jax.nn.sigmoid(x).reshape(b, cfg.block_len, cfg.code_rate_k)


# ------------------------------------------------------------------
# Registry (mirror of main.py:67-96)
# ------------------------------------------------------------------

DEC_REGISTRY: Dict[str, Any] = {
    'TurboAE_rate3_cnn': (largecnn_init, largecnn_apply),
    'TurboAE_rate3_cnn_dense': (largecnn_init, largecnn_apply),
    'TurboAE_rate3_rnn': (largernn_init, largernn_apply),
    'TurboAE_rate3_cnn_2inter': (largecnn2int_init, largecnn2int_apply),
    'TurboAE_rate2_rnn': (largernn_rate2_init, largernn_rate2_apply),
    'TurboAE_rate2_cnn': (largecnn_rate2_init, largecnn_rate2_apply),
    'nbcjr_rate3': (nbcjr_init, nbcjr_apply),
    'rate3_cnn': (cnn_rate3_init, cnn_rate3_apply),
    'TurboAE_rate3_cnn2d': (largecnn2d_init, largecnn2d_apply),
    'TurboAE_rate3_cnn2d_dense': (largecnn2d_init, largecnn2d_apply),
    'rate3_cnn2d': (cnn2d_init, cnn2d_apply),
    'turboae_2int': (largecnn2int_init, largecnn2int_apply),
}


def make_decoder(cfg):
    if cfg.decoder not in DEC_REGISTRY:
        raise ValueError(f'unknown decoder {cfg.decoder}')
    return DEC_REGISTRY[cfg.decoder]
