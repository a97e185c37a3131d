"""Composed channel autoencoder: encoder -> channel -> decoder.

Reference: Channel_AE (channel_ae.py:10-73) and Channel_ModAE (:77-128).
Pure function of (params, key, bits, noise); the interleaver permutation is an
input (built host-side once per block_len — the reference rebuilt the seed-0
permutation inside every forward, channel_ae.py:32-36, which is pure overhead;
identical numerics, done once here).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..channels.apply import apply_channel
from ..ops.ste import rx_quantize
from .encoders import make_encoder
from .decoders import make_decoder

Params = Any


def make_perms(cfg, block_len: Optional[int] = None, seed: Optional[int] = None) -> Dict[str, jnp.ndarray]:
    """Build interleaver permutations the way the reference does.

    is_interleave==0 -> identity; is_same_interleaver -> seed 0 (main.py:124-127);
    seed overrides for the variable-block-len / random-interleaver paths.
    """
    import numpy as np
    from numpy.random import mtrand
    L = block_len or cfg.block_len
    if cfg.is_interleave == 0:
        p1 = p2 = np.arange(L)
    else:
        # p_array1 and p_array2 are CONSECUTIVE draws from one RandomState
        # (reference main.py:123-127) — p2 is the second permutation from the
        # same seed, not a different seed's first
        s = 0 if seed is None else seed
        rand_gen = mtrand.RandomState(s)
        p1 = rand_gen.permutation(np.arange(L))
        p2 = rand_gen.permutation(np.arange(L))
    return {'p1': jnp.asarray(p1), 'p2': jnp.asarray(p2)}


def init_ae(key, cfg) -> Params:
    k_enc, k_dec = jax.random.split(key)
    enc_init, _ = make_encoder(cfg)
    dec_init, _ = make_decoder(cfg)
    return {'enc': enc_init(k_enc, cfg), 'dec': dec_init(k_dec, cfg)}


def forward_ae(params: Params, cfg, key, bits, fwd_noise, perms,
               training: bool = True, stats=None):
    """Full AE forward (channel_ae.py:20-73). Returns (bit_estimates, codes, stats).

    `key` drives only the fading gain draw; deterministic channels ignore it.
    """
    _, enc_apply = make_encoder(cfg)
    _, dec_apply = make_decoder(cfg)

    codes, stats = enc_apply(params['enc'], cfg, bits, perms,
                             training=training, stats=stats)
    k_chan, k_dec = jax.random.split(key)
    received = apply_channel(k_chan, codes, fwd_noise, cfg.channel)
    if cfg.rec_quantize:
        # reference passes rec_quantize_level as BOTH limit and level
        # (channel_ae.py:69) — quirk preserved.
        received = rx_quantize(received, cfg.rec_quantize_level, cfg.rec_quantize_level)
    x_dec = dec_apply(params['dec'], cfg, received, perms, key=k_dec,
                      training=training)
    return x_dec, codes, stats


def init_mod_ae(key, cfg) -> Params:
    from .modulation import mod_init, demod_init
    k1, k2, k3, k4 = jax.random.split(key, 4)
    enc_init, _ = make_encoder(cfg)
    dec_init, _ = make_decoder(cfg)
    return {'enc': enc_init(k1, cfg), 'dec': dec_init(k2, cfg),
            'mod': mod_init(k3, cfg), 'demod': demod_init(k4, cfg)}


def forward_mod_ae(params: Params, cfg, key, bits, fwd_noise, perms,
                   training: bool = True, stats=None):
    """Channel_ModAE forward (channel_ae.py:89-128): enc -> mod -> +noise ->
    demod -> dec. Noise shape is (B, L*n/mod_rate, 2)."""
    from .modulation import mod_apply, demod_apply
    _, enc_apply = make_encoder(cfg)
    _, dec_apply = make_decoder(cfg)

    codes, stats = enc_apply(params['enc'], cfg, bits, perms,
                             training=training, stats=stats)
    symbols = mod_apply(params['mod'], cfg, codes)
    received = symbols + fwd_noise          # awgn-family only (channel_ae.py:111)
    if cfg.rec_quantize:
        received = rx_quantize(received, cfg.rec_quantize_level, cfg.rec_quantize_level)
    x_rec = demod_apply(params['demod'], cfg, received)
    x_dec = dec_apply(params['dec'], cfg, x_rec, perms, key=key,
                      training=training)
    return x_dec, symbols, stats
