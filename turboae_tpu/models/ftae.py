"""FTAE — feedback-channel turbo autoencoder.

Reference: ftae_ae.py. Three forward code phases with two feedback encoders:
  phase 1: x1 = enc1(bits);            y1 = x1 + z1;  r1 = fb1(y1) + zf1
  phase 2: x2 = enc2([bits, r1, x1]);  y2 = x2 + z2;  r2 = fb2([y1, y2]) + zf2
  phase 3: x3 = enc3([bits, r1, x1, r2, x2]) (optionally interleaved input)
  decode([y1, y2, y3])
Ablations ignore_feedback / ignore_prev_code zero r_i / x_i
(ftae_ae.py:350-366). Decoders: plain CNN (ftae_ae.py:271-287), per-iteration
FTAE_decoder (:83-201, CNN or GRU), weight-shared FTAE_Shareddecoder (:206-266).

Shape note: the reference draws noise with shape (B, L, code_rate_k) but then
indexes three channels out of it (ftae_ae.py:335-341) — impossible as written
for k=1. Here noise tensors are explicitly (B, L, 3): one channel per phase.

Each phase encoder applies its own whitening power constraint
(FB_encoder_base.power_constraint, ftae_ae.py:17-36) with optional STE when
cfg.channel_mode != 'block_norm'.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import conv1d as cv
from ..ops import gru as rnn
from ..ops.interleave import interleave
from ..ops.ste import rx_quantize

Params = Any


def _dtype(cfg):
    return jnp.bfloat16 if cfg.dtype == 'bfloat16' else jnp.float32


def _fb_power_constraint(cfg, x):
    """Whitening + optional STE (ftae_ae.py:17-36); torch.std ddof=1.

    The reference quantizes with ste.py's STEQuantize — the variant whose
    backward hard-codes the ±1.0 input gate and ±0.25 gradient clamp ('both'
    mode) — NOT the args-driven encoders.py copy; rx_quantize is that
    variant."""
    m = jnp.mean(x)
    s = jnp.sqrt(jnp.sum((x - m) ** 2) / (x.size - 1))
    xn = (x - m) / s
    if cfg.channel_mode != 'block_norm':
        xn = rx_quantize(xn, 1.0, 2)
    return xn


def _phase_enc_init(key, cfg, input_size: int, with_pw: bool = False,
                    with_ps: bool = False):
    """CNN_encoder (ftae_ae.py:40-59): conv stack + Linear -> 1.

    with_pw adds a learned per-position transmit-power weight vector, with_ps
    a learned per-phase power scalar (cfg.ftae_power_alloc; forward phases
    only) — DeepCode's power-allocation mechanism. Both init at ones so a
    warm start from a uniform-power checkpoint begins bit-identical to it."""
    k1, k2 = jax.random.split(key)
    p = {'cnn': cv.stack_init(k1, cfg.enc_num_layer, input_size,
                              cfg.enc_num_unit, cfg.enc_kernel_size),
         'lin': cv.linear_init(k2, cfg.enc_num_unit, 1)}
    if with_pw:
        p['pw'] = jnp.ones((cfg.block_len, 1), jnp.float32)
    if with_ps:
        p['ps'] = jnp.ones((), jnp.float32)
    return p


def _power_alloc_scales(params, cfg):
    """(per-position weights, per-phase scalars) for the 3 forward phases.

    'pos': each phase keeps the reference's unit power but shifts it across
    block positions. 'pos_phase': additionally a learned scalar per phase,
    normalized to unit mean-square ACROSS phases, lets the total budget move
    between the three transmissions (DeepCode allocates both ways). The
    per-position normalization itself happens in forward_ftae against the
    batch's measured per-position code power, so realized power is conserved
    exactly (weights cannot correlate with the whitened output's nonuniform
    per-position power to sneak in extra transmit energy)."""
    if cfg.ftae_power_alloc == 'none':
        return (None, None, None), (None, None, None)
    ws = tuple(params[f'fwd_enc{i}']['pw'] for i in (1, 2, 3))
    if cfg.ftae_power_alloc == 'pos_phase':
        s = jnp.stack([params[f'fwd_enc{i}']['ps'] for i in (1, 2, 3)])
        s = s * lax.rsqrt(jnp.mean(s * s))
        return ws, (s[0], s[1], s[2])
    return ws, (None, None, None)


def _phase_enc_apply(p, cfg, inputs, interleave_perm=None):
    dt = _dtype(cfg)
    x = 2.0 * inputs - 1.0
    if interleave_perm is not None:
        # NOTE: the interleaved branch permutes the RAW inputs, not BPSK
        # (ftae_ae.py:74) — quirk preserved.
        x = interleave(inputs, interleave_perm)
    h = cv.stack_apply(p['cnn'], x, compute_dtype=dt)
    out = jax.nn.elu(cv.linear_apply(p['lin'], h, compute_dtype=dt))
    return _fb_power_constraint(cfg, out)


# ---------------------------------------------------------------------------
# Decoders
# ---------------------------------------------------------------------------

def _ftae_dec_init(key, cfg) -> Params:
    """FTAE_decoder (ftae_ae.py:83-138): per-iteration weights, CNN or GRU."""
    n_in = 2 + cfg.num_iter_ft
    it = cfg.num_iteration
    use_rnn = cfg.dec_type == 'turboae_rnn'
    dense = cfg.cnn_type == 'dense'
    keys = jax.random.split(key, 4 * it)

    def core_init(k):
        if use_rnn:
            return rnn.bigru_init(k, n_in, cfg.dec_num_unit, cfg.dec_num_layer)
        if dense:
            return cv.dense_stack_init(k, cfg.dec_num_layer, n_in,
                                       cfg.dec_num_unit, cfg.dec_kernel_size)
        return cv.stack_init(k, cfg.dec_num_layer, n_in, cfg.dec_num_unit,
                             cfg.dec_kernel_size)

    lin_in = 2 * cfg.dec_num_unit if use_rnn else cfg.dec_num_unit
    d1c, d2c, d1l, d2l = [], [], [], []
    for i in range(it):
        d1c.append(core_init(keys[4 * i]))
        d2c.append(core_init(keys[4 * i + 1]))
        d1l.append(cv.linear_init(keys[4 * i + 2], lin_in, cfg.num_iter_ft))
        if i == it - 1:
            final_lin = cv.linear_init(keys[4 * i + 3], lin_in, cfg.code_rate_k)
        else:
            d2l.append(cv.linear_init(keys[4 * i + 3], lin_in, cfg.num_iter_ft))

    stack = lambda xs: (jax.tree.map(lambda *a: jnp.stack(a), *xs)
                        if xs else None)
    return {'scan': {'dec1': stack(d1c[:-1]), 'dec2': stack(d2c[:-1]),
                     'lin1': stack(d1l[:-1]), 'lin2': stack(d2l)},
            'final': {'dec1': d1c[-1], 'dec2': d2c[-1],
                      'lin1': d1l[-1], 'lin2': final_lin}}


def _ftae_dec_apply(params, cfg, received, perms):
    dt = _dtype(cfg)
    use_rnn = cfg.dec_type == 'turboae_rnn'
    dense = cfg.cnn_type == 'dense'
    p = jnp.asarray(perms['p1'])
    inv = jnp.zeros_like(p).at[p].set(jnp.arange(p.shape[0]))

    def core(w, x):
        if use_rnn:
            return rnn.bigru_apply(w, x, compute_dtype=dt)
        if dense:
            return cv.dense_stack_apply(w, x, compute_dtype=dt)
        return cv.stack_apply(w, x, compute_dtype=dt)

    r_sys = received[:, :, 0:1]
    r_par1 = received[:, :, 1:2]
    r_par2 = received[:, :, 2:3]
    r_sys_int = jnp.take(r_sys, p, axis=1)
    b, l, _ = received.shape
    prior0 = jnp.zeros((b, l, cfg.num_iter_ft), jnp.float32)

    def body(prior, w):
        x = cv.linear_apply(w['lin1'], core(w['dec1'],
                            jnp.concatenate([r_sys, r_par1, prior], axis=2)),
                            compute_dtype=dt) - prior
        x_int = jnp.take(x, p, axis=1)
        x2 = cv.linear_apply(w['lin2'], core(w['dec2'],
                             jnp.concatenate([r_sys_int, r_par2, x_int], axis=2)),
                             compute_dtype=dt) - x_int
        return jnp.take(x2, inv, axis=1), None

    prior = prior0
    if cfg.num_iteration > 1:
        prior, _ = lax.scan(body, prior0, params['scan'])
    fw = params['final']
    x = cv.linear_apply(fw['lin1'], core(fw['dec1'],
                        jnp.concatenate([r_sys, r_par1, prior], axis=2)),
                        compute_dtype=dt) - prior
    x_int = jnp.take(x, p, axis=1)
    logit = cv.linear_apply(fw['lin2'], core(fw['dec2'],
                            jnp.concatenate([r_sys_int, r_par2, x_int], axis=2)),
                            compute_dtype=dt)
    return jax.nn.sigmoid(jnp.take(logit, inv, axis=1))


def _shared_dec_init(key, cfg) -> Params:
    """FTAE_Shareddecoder (ftae_ae.py:206-231): single weight set."""
    n_in = 2 + cfg.num_iter_ft
    dense = cfg.cnn_type == 'dense'
    init = cv.dense_stack_init if dense else cv.stack_init
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {'dec1': init(k1, cfg.dec_num_layer, n_in, cfg.dec_num_unit,
                         cfg.dec_kernel_size),
            'lin1': cv.linear_init(k2, cfg.dec_num_unit, cfg.num_iter_ft),
            'dec2': init(k3, cfg.dec_num_layer, n_in, cfg.dec_num_unit,
                         cfg.dec_kernel_size),
            'lin2': cv.linear_init(k4, cfg.dec_num_unit, cfg.num_iter_ft),
            'final': cv.linear_init(k5, cfg.num_iter_ft, 1)}


def _shared_dec_apply(params, cfg, received, perms):
    dt = _dtype(cfg)
    dense = cfg.cnn_type == 'dense'
    stackf = cv.dense_stack_apply if dense else cv.stack_apply
    p = jnp.asarray(perms['p1'])
    inv = jnp.zeros_like(p).at[p].set(jnp.arange(p.shape[0]))

    r_sys = received[:, :, 0:1]
    r_par1 = received[:, :, 1:2]
    r_par2 = received[:, :, 2:3]
    r_sys_int = jnp.take(r_sys, p, axis=1)
    b, l, _ = received.shape

    def body(i, carry):
        prior, _ = carry
        x = cv.linear_apply(params['lin1'], stackf(params['dec1'],
                            jnp.concatenate([r_sys, r_par1, prior], axis=2),
                            compute_dtype=dt), compute_dtype=dt) - prior
        x_int = jnp.take(x, p, axis=1)
        x2 = cv.linear_apply(params['lin2'], stackf(params['dec2'],
                             jnp.concatenate([r_sys_int, r_par2, x_int], axis=2),
                             compute_dtype=dt), compute_dtype=dt) - x_int
        return jnp.take(x2, inv, axis=1), x2

    prior = jnp.zeros((b, l, cfg.num_iter_ft), jnp.float32)
    x2_last = prior
    carry = (prior, x2_last)
    carry = lax.fori_loop(0, cfg.num_iteration, body, carry)
    _, x_plr = carry
    # final = sigmoid(final_lin(deinterleave(x_plr))) (ftae_ae.py:264)
    return jax.nn.sigmoid(cv.linear_apply(params['final'],
                                          jnp.take(x_plr, inv, axis=1),
                                          compute_dtype=dt))


def _cnn_dec_init(key, cfg) -> Params:
    k1, k2 = jax.random.split(key)
    return {'cnn': cv.stack_init(k1, cfg.dec_num_layer, cfg.code_rate_n,
                                 cfg.dec_num_unit, cfg.dec_kernel_size),
            'lin': cv.linear_init(k2, cfg.dec_num_unit, cfg.code_rate_k)}


def _cnn_dec_apply(params, cfg, received, perms):
    dt = _dtype(cfg)
    h = cv.stack_apply(params['cnn'], received, compute_dtype=dt)
    return jax.nn.sigmoid(cv.linear_apply(params['lin'], h, compute_dtype=dt))


# ---------------------------------------------------------------------------
# Composed feedback AE (Channel_Feedback_rate3, ftae_ae.py:295-377)
# ---------------------------------------------------------------------------

def init_ftae(key, cfg) -> Params:
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    if cfg.dec_type == 'cnn':
        dec = _cnn_dec_init(k6, cfg)
    elif cfg.dec_type == 'turboae_sharedcnn':
        dec = _shared_dec_init(k6, cfg)
    else:
        dec = _ftae_dec_init(k6, cfg)
    pw = cfg.ftae_power_alloc != 'none'
    ps = cfg.ftae_power_alloc == 'pos_phase'
    return {'fwd_enc1': _phase_enc_init(k1, cfg, 1, with_pw=pw, with_ps=ps),
            'fwd_enc2': _phase_enc_init(k2, cfg, 3, with_pw=pw, with_ps=ps),
            'fwd_enc3': _phase_enc_init(k3, cfg, 5, with_pw=pw, with_ps=ps),
            'fb_enc1': _phase_enc_init(k4, cfg, 1),
            'fb_enc2': _phase_enc_init(k5, cfg, 2),
            'dec': dec}


def forward_ftae(params, cfg, bits, fwd_noise, fb_noise, perms):
    """(bit_estimates, codes). fwd_noise/fb_noise: (B, L, 3)."""
    z1, z2, z3 = (fwd_noise[:, :, i:i + 1] for i in range(3))
    zf1, zf2 = (fb_noise[:, :, i:i + 1] for i in range(2))
    (w1, w2, w3), (s1, s2, s3) = _power_alloc_scales(params, cfg)

    def _alloc(x, w, s):
        """Learned per-position power weighting of the whitened phase output.

        The weight profile is renormalized against the batch's MEASURED
        per-position code power (p̄_l = E_b[x²]); realized phase power then
        equals the uniform-whitening case exactly for any w — the learned
        profile moves power between positions without changing the total.
        (L,1) broadcasts over (B,L,1). s (pos_phase) shifts power between
        phases, unit mean-square across the three transmissions."""
        if w is None:
            return x
        xf = x.astype(jnp.float32)
        pbar = jnp.mean(xf * xf, axis=0)                       # (L,1)
        w2_ = w * w
        factor = lax.rsqrt(jnp.mean(w2_ * pbar) / jnp.mean(pbar))
        out = x * (w * factor).astype(x.dtype)
        if s is not None:
            out = out * s.astype(x.dtype)
        return out

    x1 = _alloc(_phase_enc_apply(params['fwd_enc1'], cfg, bits), w1, s1)
    y1 = x1 + z1
    r1 = _phase_enc_apply(params['fb_enc1'], cfg, y1) + zf1

    if cfg.ignore_feedback:
        r1 = r1 * 0.0
    x1_in = x1 * 0.0 if cfg.ignore_prev_code else x1
    x2 = _alloc(_phase_enc_apply(params['fwd_enc2'], cfg,
                jnp.concatenate([bits, r1, x1_in], axis=2)), w2, s2)
    y2 = x2 + z2
    r2 = _phase_enc_apply(params['fb_enc2'], cfg,
                          jnp.concatenate([y1, y2], axis=2)) + zf2

    if cfg.ignore_feedback:
        r2 = r2 * 0.0
    x2_in = x2 * 0.0 if cfg.ignore_prev_code else x2
    enc3_in = jnp.concatenate([bits, r1, x1_in, r2, x2_in], axis=2)
    perm = perms['p1'] if cfg.is_interleave else None
    x3 = _alloc(_phase_enc_apply(params['fwd_enc3'], cfg, enc3_in,
                                 interleave_perm=perm), w3, s3)
    y3 = x3 + z3

    # the reference overwrites x_1/x_2 THEMSELVES when ignore_prev_code is
    # set (ftae_ae.py:355,367), so the returned codes carry the zeros too
    codes = jnp.concatenate([x1_in, x2_in, x3], axis=2)
    received = jnp.concatenate([y1, y2, y3], axis=2)

    if cfg.dec_type == 'cnn':
        final = _cnn_dec_apply(params['dec'], cfg, received, perms)
    elif cfg.dec_type == 'turboae_sharedcnn':
        final = _shared_dec_apply(params['dec'], cfg, received, perms)
    else:
        final = _ftae_dec_apply(params['dec'], cfg, received, perms)
    return final, codes
