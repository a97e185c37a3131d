"""Channel application: combine transmitted codes with sampled noise.

Reference: Channel_AE.forward's channel branch (channel_ae.py:41-65):
  - additive channels (awgn/t-dist/radar/ge_awgn): received = codes + noise
  - erasure (bec) and discrete GE:                 received = codes * mask
  - flip (bsc):                                    received = codes * (2*mask - 1)
  - non-coherent Rayleigh fading:                  received = h * codes + noise,
    h = sqrt(N1^2 + N2^2) / sqrt(pi/2)  (reference uses 3.14/2.0 — kept)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ADDITIVE = ('awgn', 't-dist', 'radar', 'ge_awgn')


def apply_channel(key, codes: jnp.ndarray, noise: jnp.ndarray, channel: str) -> jnp.ndarray:
    if channel in ADDITIVE:
        return codes + noise
    if channel == 'bec':
        return codes * noise
    if channel in ('bsc',):
        return codes * (2.0 * noise - 1.0)
    if channel == 'ge':
        # reference routes 'ge' through the sign-flip branch (channel_ae.py:47-49)
        return codes * (2.0 * noise - 1.0)
    if channel == 'fading':
        k1, k2 = jax.random.split(key)
        h = jnp.sqrt(jax.random.normal(k1, codes.shape) ** 2 +
                     jax.random.normal(k2, codes.shape) ** 2) / jnp.sqrt(3.14 / 2.0)
        return h * codes + noise
    return codes + noise
