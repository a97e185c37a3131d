"""Channel noise samplers — stateless, key-driven, fully vectorized.

Reference: channels.py:7-115 (generate_noise). Every sampler here is a pure
function of a jax PRNG key, jit/vmap-friendly, and runs on device. The
Gilbert-Elliott channels, which the reference computes with a triple Python
loop over (batch, time, channel) (channels.py:62-83 — its worst perf cliff),
are lax.scan Markov chains over the time axis, vectorized over batch and
channel lanes.

Train-time SNR is a per-element uniform sigma mixture in
[sigma(snr_high), sigma(snr_low)] (reference channels.py:22-25). Channel
*application* (additive / erasure / flip / fading) lives in channels/apply.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.metrics import snr_db2sigma


class NoiseSpec(NamedTuple):
    """Static channel parameters (hashable; safe as a jit static arg)."""
    channel: str = 'awgn'
    vv: float = 5.0
    radar_prob: float = 0.05
    radar_power: float = 5.0


def spec_from_cfg(cfg) -> NoiseSpec:
    return NoiseSpec(cfg.channel, cfg.vv, cfg.radar_prob, cfg.radar_power)


def train_sigma(key, shape, snr_low: float, snr_high: float) -> jnp.ndarray:
    """Per-element uniform sigma in [sigma(high), sigma(low)] (channels.py:22-25)."""
    s_low = snr_db2sigma(snr_low)    # larger sigma (lower SNR)
    s_high = snr_db2sigma(snr_high)  # smaller sigma
    u = jax.random.uniform(key, shape)
    return (s_low - s_high) * u + s_high


def _student_t(key, shape, df: float) -> jnp.ndarray:
    """Variance-normalized Student-t: sqrt((v-2)/v) * t_v (channels.py:38)."""
    t = jax.random.t(key, df, shape)
    return jnp.sqrt((df - 2.0) / df) * t


def _ge_scan(key, shape, emit_good, emit_bad, p_gg: float = 0.8, p_bb: float = 0.8):
    """Gilbert-Elliott 2-state Markov chain over the time axis.

    shape = (B, L, C). emit_good/emit_bad: (B, L, C) arrays of the values
    emitted in each state. The chain starts in the good state and transitions
    *after* each emission, exactly as the reference loop does
    (channels.py:66-79). Returns the emitted (B, L, C) tensor.
    """
    b, l, c = shape
    stay = jax.random.uniform(key, (l, b, c))  # per-step transition draws

    def step(good, xs):
        stay_u, e_good, e_bad = xs
        emit = jnp.where(good, e_good, e_bad)
        # reference executable semantics (channels.py:73,79): from BOTH
        # states, `good = rand() < p` — i.e. p_gg is P(stay good) but p_bb is
        # P(RETURN to good); the "stay in bad" probability is 1 - p_bb. The
        # comments in the reference say "stay" for both; the code wins.
        p_good_next = jnp.where(good, p_gg, p_bb)
        good_next = stay_u < p_good_next
        return good_next, emit

    init = jnp.ones((b, c), dtype=bool)
    eg = jnp.swapaxes(emit_good, 0, 1)  # (L, B, C)
    eb = jnp.swapaxes(emit_bad, 0, 1)
    _, out = jax.lax.scan(step, init, (stay, eg, eb))
    return jnp.swapaxes(out, 0, 1)


def sample_noise(key, shape, spec: NoiseSpec, sigma) -> jnp.ndarray:
    """Draw the forward-noise tensor for a continuous or mask channel.

    `sigma`: scalar or broadcastable array — noise sigma for AWGN-family, or the
    erasure/flip probability for bec/bsc/ge. Matches reference generate_noise
    (channels.py:34-113); the channel *application* semantics live in apply.py.
    """
    ch = spec.channel
    sigma = jnp.asarray(sigma, jnp.float32)

    if ch == 'awgn':
        return sigma * jax.random.normal(key, shape)

    if ch == 't-dist':
        return sigma * _student_t(key, shape, spec.vv)

    if ch == 'radar':
        k1, k2, k3 = jax.random.split(key, 3)
        add_pos = (jax.random.uniform(k1, shape) < spec.radar_prob).astype(jnp.float32)
        burst = spec.radar_power * jax.random.normal(k2, shape) * add_pos
        return sigma * jax.random.normal(k3, shape) + burst

    if ch in ('bec', 'bsc'):
        # mask of 1s (keep) with erasure/flip prob sigma (channels.py:48-54)
        return (jax.random.uniform(key, shape) >= sigma).astype(jnp.float32)

    if ch == 'ge_awgn':
        # Good state: sigma(SNR+1dB); bad state: sigma(SNR-1dB) (channels.py:55-83).
        k1, k2 = jax.random.split(key)
        snr = -20.0 * jnp.log10(sigma)
        sig_good = jnp.broadcast_to(snr_db2sigma(snr + 1.0), shape)
        sig_bad = jnp.broadcast_to(snr_db2sigma(snr - 1.0), shape)
        sig = _ge_scan(k1, shape, sig_good, sig_bad)
        return sig * jax.random.normal(k2, shape)

    if ch == 'ge':
        # Discrete GE: good state emits 1 (keep) w.p. 1.0, bad keeps w.p. sigma
        # (channels.py:85-109).
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, shape)
        keep_good = jnp.ones(shape, jnp.float32)
        keep_bad = (u < sigma).astype(jnp.float32)
        return _ge_scan(k2, shape, keep_good, keep_bad)

    if ch == 'fading':
        # fading noise itself is AWGN; the Rayleigh gain h is drawn in apply.py
        return sigma * jax.random.normal(key, shape)

    # unknown channel: AWGN fallback (channels.py:111-113)
    return sigma * jax.random.normal(key, shape)


def generate_noise(key, shape, cfg, test_sigma=None, snr_low: float = 0.0,
                   snr_high: float = 0.0, mode: str = 'encoder') -> jnp.ndarray:
    """Reference-compatible entry (channels.py:7-115).

    test_sigma=None means training mode: per-element uniform sigma mixture in
    [sigma(snr_high), sigma(snr_low)] for continuous channels, or the static
    bec/bsc probability. test_sigma set: eval at snr=test_sigma dB for
    continuous channels (converted via snr_db2sigma, reference channels.py:31),
    or the raw probability for binary channels.
    """
    spec = spec_from_cfg(cfg)
    k_sig, k_noise = jax.random.split(key)

    if test_sigma is None:
        if cfg.channel == 'bec':
            sigma = cfg.bec_p if mode == 'encoder' else cfg.bec_p_dec
        elif cfg.channel in ('bsc', 'ge'):
            sigma = cfg.bsc_p if mode == 'encoder' else cfg.bsc_p_dec
        else:
            sigma = train_sigma(k_sig, shape, snr_low, snr_high)
    else:
        if cfg.channel in ('bec', 'bsc', 'ge'):
            sigma = test_sigma
        else:
            sigma = snr_db2sigma(test_sigma)

    return sample_noise(k_noise, shape, spec, sigma)
