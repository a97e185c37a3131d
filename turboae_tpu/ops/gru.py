"""Bidirectional multi-layer GRU/LSTM via lax.scan.

The reference's RNN encoders/decoders use torch.nn.GRU/LSTM (batch_first,
bidirectional, 1-2 layers; reference encoders.py:250-266, decoders.py:41-50).
On TPU a recurrent cell is a sequential dependency, so the time loop is a
lax.scan whose per-step work is a (B, H)x(H, 3H) matmul — batched large enough
to keep the MXU busy. The input projection x @ W_ih for ALL timesteps is
hoisted out of the scan (one big (B*L, Cin)x(Cin, 3H) matmul) so only the
recurrent half stays sequential.

Gate math follows torch's GRU exactly (r/z/n gate ordering, separate b_ih/b_hh,
n-gate uses r * (h @ W_hn + b_hn)) so torch checkpoints can be transliterated.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

Params = Any


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def gru_layer_init(key, input_size: int, hidden_size: int) -> Params:
    """One direction of one GRU layer; torch layout: W_ih (3H, In), W_hh (3H, H)
    stored transposed for right-multiplication."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(hidden_size)
    return {
        'w_ih': _uniform(k1, (input_size, 3 * hidden_size), bound),
        'w_hh': _uniform(k2, (hidden_size, 3 * hidden_size), bound),
        'b_ih': _uniform(k3, (3 * hidden_size,), bound),
        'b_hh': _uniform(k4, (3 * hidden_size,), bound),
    }


def _gru_scan(params: Params, x: jnp.ndarray, reverse: bool, compute_dtype) -> jnp.ndarray:
    """Run one GRU direction over (B, L, In) -> (B, L, H)."""
    b, l, _ = x.shape
    h_dim = params['w_hh'].shape[0]
    w_hh = params['w_hh'].astype(compute_dtype)
    b_hh = params['b_hh']

    # hoist the input projection out of the scan: (B, L, 3H)
    gi_all = jnp.dot(x.astype(compute_dtype), params['w_ih'].astype(compute_dtype),
                     preferred_element_type=jnp.float32) + params['b_ih']
    gi_all = jnp.swapaxes(gi_all, 0, 1)  # (L, B, 3H) scan over time

    def step(h, gi):
        gh = jnp.dot(h.astype(compute_dtype), w_hh,
                     preferred_element_type=jnp.float32) + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((b, h_dim), jnp.float32)
    _, hs = lax.scan(step, h0, gi_all, reverse=reverse)
    if reverse:
        # scan(reverse=True) already emits outputs aligned to input order
        pass
    return jnp.swapaxes(hs, 0, 1)  # (B, L, H)


def bigru_init(key, input_size: int, hidden_size: int, num_layers: int) -> Params:
    """Bidirectional multi-layer GRU; layer l>0 consumes 2H features."""
    layers = []
    keys = jax.random.split(key, num_layers * 2)
    for layer in range(num_layers):
        in_sz = input_size if layer == 0 else 2 * hidden_size
        layers.append({
            'fwd': gru_layer_init(keys[2 * layer], in_sz, hidden_size),
            'bwd': gru_layer_init(keys[2 * layer + 1], in_sz, hidden_size),
        })
    return layers


def _interlayer_dropout(x, rate, key, layer_idx, n_layers):
    """torch.nn.GRU(dropout=r): dropout on every layer's output EXCEPT the
    last (reference DEC_LargeRNN builds its GRUs with dropout=args.dropout,
    decoders.py:44,49). No-op when rate==0 or key is None (eval)."""
    if rate <= 0.0 or key is None or layer_idx >= n_layers - 1:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(jax.random.fold_in(key, layer_idx), keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def bigru_apply(layers: Params, x: jnp.ndarray, compute_dtype=jnp.float32,
                dropout: float = 0.0, key=None) -> jnp.ndarray:
    """(B, L, In) -> (B, L, 2H): per-layer fwd+bwd scans, concat features."""
    for i, layer in enumerate(layers):
        fwd = _gru_scan(layer['fwd'], x, reverse=False, compute_dtype=compute_dtype)
        bwd = _gru_scan(layer['bwd'], x, reverse=True, compute_dtype=compute_dtype)
        x = jnp.concatenate([fwd, bwd], axis=-1)
        x = _interlayer_dropout(x, dropout, key, i, len(layers))
    return x


# ---------------- LSTM (reference allows -enc_rnn lstm) ----------------

def lstm_layer_init(key, input_size: int, hidden_size: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(hidden_size)
    return {
        'w_ih': _uniform(k1, (input_size, 4 * hidden_size), bound),
        'w_hh': _uniform(k2, (hidden_size, 4 * hidden_size), bound),
        'b_ih': _uniform(k3, (4 * hidden_size,), bound),
        'b_hh': _uniform(k4, (4 * hidden_size,), bound),
    }


def _lstm_scan(params: Params, x: jnp.ndarray, reverse: bool, compute_dtype) -> jnp.ndarray:
    b, l, _ = x.shape
    h_dim = params['w_hh'].shape[0]
    w_hh = params['w_hh'].astype(compute_dtype)
    b_hh = params['b_hh']
    gi_all = jnp.dot(x.astype(compute_dtype), params['w_ih'].astype(compute_dtype),
                     preferred_element_type=jnp.float32) + params['b_ih']
    gi_all = jnp.swapaxes(gi_all, 0, 1)

    def step(carry, gi):
        h, c = carry
        gates = gi + jnp.dot(h.astype(compute_dtype), w_hh,
                             preferred_element_type=jnp.float32) + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    init = (jnp.zeros((b, h_dim), jnp.float32), jnp.zeros((b, h_dim), jnp.float32))
    _, hs = lax.scan(step, init, gi_all, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


def bilstm_init(key, input_size: int, hidden_size: int, num_layers: int) -> Params:
    layers = []
    keys = jax.random.split(key, num_layers * 2)
    for layer in range(num_layers):
        in_sz = input_size if layer == 0 else 2 * hidden_size
        layers.append({
            'fwd': lstm_layer_init(keys[2 * layer], in_sz, hidden_size),
            'bwd': lstm_layer_init(keys[2 * layer + 1], in_sz, hidden_size),
        })
    return layers


def bilstm_apply(layers: Params, x: jnp.ndarray, compute_dtype=jnp.float32,
                 dropout: float = 0.0, key=None) -> jnp.ndarray:
    for i, layer in enumerate(layers):
        fwd = _lstm_scan(layer['fwd'], x, reverse=False, compute_dtype=compute_dtype)
        bwd = _lstm_scan(layer['bwd'], x, reverse=True, compute_dtype=compute_dtype)
        x = jnp.concatenate([fwd, bwd], axis=-1)
        x = _interlayer_dropout(x, dropout, key, i, len(layers))
    return x


def birnn_init(key, input_size: int, hidden_size: int, num_layers: int, kind: str):
    if kind == 'lstm':
        return bilstm_init(key, input_size, hidden_size, num_layers)
    return bigru_init(key, input_size, hidden_size, num_layers)


def birnn_apply(layers, x, kind: str, compute_dtype=jnp.float32,
                dropout: float = 0.0, key=None):
    if kind == 'lstm':
        return bilstm_apply(layers, x, compute_dtype, dropout=dropout, key=key)
    return bigru_apply(layers, x, compute_dtype, dropout=dropout, key=key)
