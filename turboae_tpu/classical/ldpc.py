"""LDPC codes: design-file parsing, construction, and BP decoding.

Reference: commpy/channelcoding/ldpc.py. The reference decodes one codeword
with Python loops over check/variable nodes (:192-235). Here:

  * `get_ldpc_code_params` parses the same Gallager design-file format
    (n_vnodes n_cnodes / max degs / deg lists / adjacency, 1-indexed,
    tab-separated) so the reference's design files load unchanged;
  * `gallager_ldpc_design` constructs a regular (dv, dc) Gallager ensemble
    matrix from a seed, so the framework is standalone (no vendored data);
  * `ldpc_bp_decode` is a VECTORIZED numpy BP (SPA tanh-product or MSA
    min-sum) over padded edge arrays — same message schedule and early
    termination as the reference;
  * `make_jax_ldpc_decoder` is the batched TPU path: (B, n) LLRs in one
    XLA program, fixed-iteration BP with per-block output freezing at first
    parity satisfaction (matches early-termination semantics).

LLR convention follows the reference: positive LLR -> bit 0.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

MAX_POS_LLR = 38.0
MIN_NEG_LLR = -38.0


def get_ldpc_code_params(ldpc_design_filename: str) -> Dict:
    """Parse a Gallager design file (reference ldpc.py:14-85)."""
    with open(ldpc_design_filename) as f:
        n_vnodes, n_cnodes = (int(x) for x in f.readline().split())
        max_vnode_deg, max_cnode_deg = (int(x) for x in f.readline().split())
        vnode_deg_list = np.array(f.readline().split(), int)
        cnode_deg_list = np.array(f.readline().split(), int)
        vnode_adj = -np.ones((n_vnodes, max_vnode_deg), int)
        for v in range(n_vnodes):
            row = [int(x) - 1 for x in f.readline().split()]
            vnode_adj[v, :len(row)] = row
        cnode_adj = -np.ones((n_cnodes, max_cnode_deg), int)
        for c in range(n_cnodes):
            row = [int(x) - 1 for x in f.readline().split()]
            cnode_adj[c, :len(row)] = row
    return _build_params(n_vnodes, n_cnodes, vnode_deg_list, cnode_deg_list,
                         vnode_adj, cnode_adj)


def _build_params(n_vnodes, n_cnodes, vnode_deg_list, cnode_deg_list,
                  vnode_adj, cnode_adj) -> Dict:
    max_vnode_deg = vnode_adj.shape[1]
    max_cnode_deg = cnode_adj.shape[1]

    # slot maps: cnode_vnode_map[c, i] = which slot of vnode_adj[v] points
    # back to c (reference ldpc.py:49-60)
    cnode_vnode_map = -np.ones((n_cnodes, max_cnode_deg), int)
    vnode_cnode_map = -np.ones((n_vnodes, max_vnode_deg), int)
    for c in range(n_cnodes):
        for i in range(cnode_deg_list[c]):
            v = cnode_adj[c, i]
            cnode_vnode_map[c, i] = int(np.where(vnode_adj[v] == c)[0][0])
    for v in range(n_vnodes):
        for i in range(vnode_deg_list[v]):
            c = vnode_adj[v, i]
            vnode_cnode_map[v, i] = int(np.where(cnode_adj[c] == v)[0][0])

    pmat = np.zeros((n_cnodes, n_vnodes), int)
    for c in range(n_cnodes):
        pmat[c, cnode_adj[c, :cnode_deg_list[c]]] = 1

    return {
        'n_vnodes': n_vnodes, 'n_cnodes': n_cnodes,
        'max_vnode_deg': max_vnode_deg, 'max_cnode_deg': max_cnode_deg,
        'vnode_deg_list': vnode_deg_list, 'cnode_deg_list': cnode_deg_list,
        'vnode_adj_list': vnode_adj.flatten().astype(np.int32),
        'cnode_adj_list': cnode_adj.flatten().astype(np.int32),
        'vnode_cnode_map': vnode_cnode_map.flatten().astype(np.int32),
        'cnode_vnode_map': cnode_vnode_map.flatten().astype(np.int32),
        'pmat': pmat,
    }


def gallager_ldpc_design(n: int, dv: int, dc: int, seed: int = 0) -> Dict:
    """Regular (dv, dc) Gallager ensemble: n vnodes, n*dv/dc cnodes.

    Construction: dv permuted copies of a band structure; resamples on
    duplicate edges. Standalone replacement for the vendored design files.
    """
    assert (n * dv) % dc == 0
    m = n * dv // dc
    rng = np.random.RandomState(seed)
    while True:
        # socket permutation construction
        sockets = np.repeat(np.arange(m), dc)
        for _ in range(64):
            rng.shuffle(sockets)
            cnode_of_edge = sockets.reshape(n, dv)
            if all(len(set(cnode_of_edge[v])) == dv for v in range(n)):
                break
        else:
            continue
        vnode_adj = np.sort(cnode_of_edge, axis=1)
        counts = np.zeros(m, int)
        cnode_adj = -np.ones((m, dc), int)
        ok = True
        for v in range(n):
            for c in vnode_adj[v]:
                if counts[c] >= dc:
                    ok = False
                    break
                cnode_adj[c, counts[c]] = v
                counts[c] += 1
            if not ok:
                break
        if ok:
            break
    return _build_params(n, m, np.full(n, dv), np.full(m, dc),
                         vnode_adj, cnode_adj)


def _edge_messages(params):
    """Dense (padded) edge views used by the vectorized decoders."""
    n_v, n_c = params['n_vnodes'], params['n_cnodes']
    dv, dc = params['max_vnode_deg'], params['max_cnode_deg']
    v_adj = params['vnode_adj_list'].reshape(n_v, dv)
    c_adj = params['cnode_adj_list'].reshape(n_c, dc)
    v_map = params['vnode_cnode_map'].reshape(n_v, dv)
    c_map = params['cnode_vnode_map'].reshape(n_c, dc)
    v_mask = np.arange(dv)[None, :] < params['vnode_deg_list'][:, None]
    c_mask = np.arange(dc)[None, :] < params['cnode_deg_list'][:, None]
    return v_adj, c_adj, v_map, c_map, v_mask, c_mask


def ldpc_bp_decode(llr_vec: np.ndarray, ldpc_code_params: Dict,
                   decoder_algorithm: str = 'SPA', n_iters: int = 100):
    """Vectorized BP decode of ONE codeword (reference ldpc.py:130-237).

    Returns (dec_word, out_llrs)."""
    p = ldpc_code_params
    v_adj, c_adj, v_map, c_map, v_mask, c_mask = _edge_messages(p)
    llr = np.asarray(llr_vec, float)

    # vnode -> cnode messages, shape (n_vnodes, dv)
    v_msgs = np.where(v_mask, llr[:, None], 0.0)
    dec_word = np.zeros(p['n_vnodes'], int)
    out_llrs = llr.copy()

    for _ in range(n_iters):
        # gather incoming messages at each check node: (n_cnodes, dc)
        incoming = v_msgs[c_adj, c_map]
        if decoder_algorithm == 'SPA':
            t = np.tanh(incoming / 2.0)
            t = np.where(c_mask, t, 1.0)
            prod = np.prod(t, axis=1, keepdims=True)
            with np.errstate(divide='ignore', invalid='ignore'):
                ratio = np.clip(prod / np.where(t == 0, 1e-30, t), -0.9999999, 0.9999999)
            c_msgs = 2.0 * np.arctanh(ratio)
        elif decoder_algorithm == 'MSA':
            mag = np.where(c_mask, np.abs(incoming), np.inf)
            sgn = np.where(c_mask, np.sign(incoming), 1.0)
            sgn = np.where(sgn == 0, 1.0, sgn)
            total_sign = np.prod(sgn, axis=1, keepdims=True)
            # leave-one-out min: min and second-min
            order = np.argsort(mag, axis=1)
            min1 = np.take_along_axis(mag, order[:, :1], axis=1)
            min2 = np.take_along_axis(mag, order[:, 1:2], axis=1)
            is_min = np.arange(mag.shape[1])[None, :] == order[:, :1]
            loo_min = np.where(is_min, min2, min1)
            c_msgs = total_sign * sgn * loo_min
        else:
            raise NameError('Please input a valid decoder_algorithm string.')
        c_msgs = np.where(c_mask, c_msgs, 0.0)

        # variable node update
        incoming_v = c_msgs[v_adj, v_map]                  # (n_vnodes, dv)
        incoming_v = np.where(v_mask, incoming_v, 0.0)
        msg_sum = incoming_v.sum(axis=1)
        v_msgs = np.clip(llr[:, None] + msg_sum[:, None] - incoming_v,
                         MIN_NEG_LLR, MAX_POS_LLR)
        v_msgs = np.where(v_mask, v_msgs, 0.0)

        out_llrs = llr + msg_sum
        dec_word = (out_llrs <= 0).astype(int)

        # early termination on parity satisfaction
        parity = np.bitwise_xor.reduce(
            np.where(c_mask, dec_word[c_adj], 0), axis=1)
        if not parity.any():
            break

    return dec_word, out_llrs


def make_jax_ldpc_decoder(ldpc_code_params: Dict, decoder_algorithm: str = 'SPA',
                          n_iters: int = 100):
    """Batched BP decoder: fn(llr (B, n)) -> (bits (B, n) int32, llr (B, n)).

    Fixed-iteration lax.scan with per-block freezing at first parity
    satisfaction (same results as early termination)."""
    import jax
    import jax.numpy as jnp

    p = ldpc_code_params
    v_adj, c_adj, v_map, c_map, v_mask, c_mask = _edge_messages(p)
    v_adj, c_adj = jnp.asarray(v_adj), jnp.asarray(c_adj)
    v_map, c_map = jnp.asarray(v_map), jnp.asarray(c_map)
    v_mask_j, c_mask_j = jnp.asarray(v_mask), jnp.asarray(c_mask)

    def decode(llr):
        B = llr.shape[0]
        v_msgs0 = jnp.where(v_mask_j[None], llr[:, :, None], 0.0)

        def body(carry, _):
            v_msgs, done, frozen_bits, frozen_llrs = carry
            incoming = v_msgs[:, c_adj, c_map]
            if decoder_algorithm == 'SPA':
                t = jnp.where(c_mask_j[None], jnp.tanh(incoming / 2.0), 1.0)
                prod = jnp.prod(t, axis=2, keepdims=True)
                ratio = jnp.clip(prod / jnp.where(t == 0, 1e-30, t),
                                 -0.9999999, 0.9999999)
                c_msgs = 2.0 * jnp.arctanh(ratio)
            else:  # MSA
                mag = jnp.where(c_mask_j[None], jnp.abs(incoming), jnp.inf)
                sgn = jnp.where(c_mask_j[None], jnp.sign(incoming), 1.0)
                sgn = jnp.where(sgn == 0, 1.0, sgn)
                total_sign = jnp.prod(sgn, axis=2, keepdims=True)
                min1 = jnp.min(mag, axis=2, keepdims=True)
                arg1 = jnp.argmin(mag, axis=2, keepdims=True)
                mag2 = jnp.where(jnp.arange(mag.shape[2])[None, None] == arg1,
                                 jnp.inf, mag)
                min2 = jnp.min(mag2, axis=2, keepdims=True)
                is_min = jnp.arange(mag.shape[2])[None, None] == arg1
                loo = jnp.where(is_min, min2, min1)
                c_msgs = total_sign * sgn * loo
            c_msgs = jnp.where(c_mask_j[None], c_msgs, 0.0)

            incoming_v = jnp.where(v_mask_j[None], c_msgs[:, v_adj, v_map], 0.0)
            msg_sum = incoming_v.sum(axis=2)
            new_v_msgs = jnp.clip(llr[:, :, None] + msg_sum[:, :, None] - incoming_v,
                                  MIN_NEG_LLR, MAX_POS_LLR)
            new_v_msgs = jnp.where(v_mask_j[None], new_v_msgs, 0.0)

            out_llrs = llr + msg_sum
            bits = (out_llrs <= 0).astype(jnp.int32)
            parity = jnp.sum(jnp.where(c_mask_j[None], bits[:, c_adj], 0),
                             axis=2) % 2
            ok = jnp.all(parity == 0, axis=1)

            # freeze outputs at first parity satisfaction; keep updating
            # the rest
            live = ~done
            frozen_bits = jnp.where(live[:, None], bits, frozen_bits)
            frozen_llrs = jnp.where(live[:, None], out_llrs, frozen_llrs)
            v_msgs = jnp.where(done[:, None, None], v_msgs, new_v_msgs)
            done = done | ok
            return (v_msgs, done, frozen_bits, frozen_llrs), None

        init = (v_msgs0, jnp.zeros(B, bool),
                (llr <= 0).astype(jnp.int32), llr)
        (_, done, fbits, fllrs), _ = jax.lax.scan(body, init, None,
                                                  length=n_iters)
        return fbits, fllrs

    return decode
