"""DeepTurbo: fixed classical Turbo encoder feeding a neural decoder.

Reference: ENC_TurboCode + turbo_enc (encoders.py:758-801) — which loops
Python-per-block calling commpy on the host. Here the turbo encode runs
ON DEVICE via the table-driven lax.scan encoder (classical/convcode.py), so
DeepTurbo training is a single fused XLA program like everything else.

Encoder registry names: 'Turbo_rate3_757' (M=2, G=[7,5], fb=7) and
'Turbo_rate3_lte' (M=3, G=[13,11], fb=13); output is BPSK-mapped 2*code-1
with NO power constraint (encoders.py:767).
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp

from ..classical.convcode import make_jax_encoder
from ..classical.trellis import turbo757_trellis, turbo_lte_trellis


@lru_cache(maxsize=4)
def _cached_encoder(kind: str):
    trellis = turbo_lte_trellis() if kind == 'lte' else turbo757_trellis()
    return make_jax_encoder(trellis, 'rsc'), trellis.total_memory


def turbo_enc_init(key, cfg):
    return {}  # non-trainable


def turbo_enc_apply(params, cfg, x, perms, training=True, stats=None):
    kind = 'lte' if cfg.encoder == 'Turbo_rate3_lte' else '757'
    enc, M = _cached_encoder(kind)
    B, L, _ = x.shape
    msgs = jnp.round(x[:, :, 0]).astype(jnp.int32)

    s1 = enc(msgs).reshape(B, L + M, 2)
    sys_full = s1[:, :, 0]
    par1 = s1[:, :L, 1]
    # interleave the padded sys stream with the length-L p_array (drops tail,
    # matching commpy interlv semantics — see classical/turbo.py)
    inter = jnp.take(sys_full, jnp.asarray(perms['p1']), axis=1)
    s2 = enc(inter).reshape(B, L + M, 2)
    par2 = s2[:, :L, 1]

    codes = jnp.stack([sys_full[:, :L], par1, par2], axis=2).astype(jnp.float32)
    return 2.0 * codes - 1.0, stats
