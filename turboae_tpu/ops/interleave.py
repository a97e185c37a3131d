"""Interleaver permutation ops.

The reference implements interleaving as a fancy-indexed permutation along the
time axis (reference: interleavers.py:15-21) with the permutation drawn from a
NumPy MT19937 RandomState (reference: commpy/channelcoding/interleavers.py:77-82).
Bit-exactness with the reference requires that exact generator, so permutations
are ALWAYS built host-side with numpy and handed to jit as device arrays —
never with jax PRNG.

On TPU the gather compiles to a single HBM-bandwidth-bound dynamic-gather; under
a time-sharded layout it would lower to an all-to-all (see dist/ for that path).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from numpy.random import mtrand


def rand_perm(block_len: int, seed: int) -> np.ndarray:
    """MT19937 permutation, identical to commpy RandInterlv(length, seed).p_array."""
    rand_gen = mtrand.RandomState(seed)
    return rand_gen.permutation(np.arange(block_len))


def invert_perm(p_array: np.ndarray) -> np.ndarray:
    """Inverse permutation (reference interleavers.py:29-41 builds it by index loop)."""
    inv = np.zeros(len(p_array), dtype=np.int64)
    inv[np.asarray(p_array)] = np.arange(len(p_array))
    return inv


def interleave(x: jnp.ndarray, p_array) -> jnp.ndarray:
    """Permute the time axis (axis=1) of a (B, L, C) tensor: out[:, i] = x[:, p[i]].

    Matches reference Interleaver.forward (interleavers.py:15-21), which permutes
    to (L, B, C), indexes rows with p_array, and permutes back.
    """
    return jnp.take(x, jnp.asarray(p_array), axis=1)


def deinterleave(x: jnp.ndarray, p_array) -> jnp.ndarray:
    """Inverse of `interleave` given the same forward permutation.

    Matches reference DeInterleaver.forward (interleavers.py:43-48). Expects the
    FORWARD p_array; inverts host-side when given numpy, else scatters.
    """
    p = np.asarray(p_array) if not isinstance(p_array, jnp.ndarray) else p_array
    if isinstance(p, np.ndarray):
        return jnp.take(x, jnp.asarray(invert_perm(p)), axis=1)
    # traced path: scatter-based inverse gather
    inv = jnp.zeros_like(p).at[p].set(jnp.arange(p.shape[0]))
    return jnp.take(x, inv, axis=1)


def interleave_2d(x: jnp.ndarray, p_array) -> jnp.ndarray:
    """2D variant: flatten (H, W) spatial dims, permute, restore (reference interleavers.py:110-130).

    x: (B, C, H, W) with H*W == len(p_array).
    """
    b, c, h, w = x.shape
    flat = x.reshape(b, c, h * w)
    out = jnp.take(flat, jnp.asarray(p_array), axis=2)
    return out.reshape(b, c, h, w)


def deinterleave_2d(x: jnp.ndarray, p_array) -> jnp.ndarray:
    """Inverse of interleave_2d (reference interleavers.py:132-163)."""
    b, c, h, w = x.shape
    flat = x.reshape(b, c, h * w)
    out = jnp.take(flat, jnp.asarray(invert_perm(np.asarray(p_array))), axis=2)
    return out.reshape(b, c, h, w)
