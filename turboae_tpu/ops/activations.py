"""Activation menu shared by encoders/decoders (reference encoders.py:86-100,
decoders.py:59-73). 'linear'/unknown pass through."""
from __future__ import annotations

import jax
import jax.numpy as jnp

_ACTS = {
    'tanh': jnp.tanh,
    'elu': jax.nn.elu,
    'relu': jax.nn.relu,
    'selu': jax.nn.selu,
    'sigmoid': jax.nn.sigmoid,
    'prelu': jax.nn.leaky_relu,
}


def activation(name: str):
    return _ACTS.get(name, lambda x: x)
