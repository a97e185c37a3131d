"""Checkpointing: params + optimizer state + step, with resume.

The reference only saves a state_dict at the end of training (main.py:248) and
loads with strict=False (main.py:162-174). Here checkpoints carry params AND
optimizer state (flax serialization msgpack), enabling true mid-training
resume; loading tolerates architecture drift by merging only matching leaves
(the strict=False analog).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    step: int = 0) -> None:
    payload = {'params': jax.tree.map(np.asarray, params), 'step': step}
    if opt_state is not None:
        # to_state_dict converts optax namedtuple states into plain dicts
        # that msgpack can carry
        payload['opt_state'] = serialization.to_state_dict(
            jax.tree.map(np.asarray, opt_state))
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict(payload))
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, params_template: Any,
                    opt_state_template: Any = None, stats: dict = None):
    """Load, merging only leaves whose paths+shapes match the template
    (the reference's strict=False load, main.py:168-174).

    `stats` (optional dict) receives {'merged': n, 'kept': n} — the number of
    template leaves replaced from the file vs silently kept. Callers doing
    cross-architecture warm starts should check merged > 0: a wrong path or
    incompatible family otherwise "loads" zero leaves without any error."""
    with open(path, 'rb') as f:
        payload = serialization.msgpack_restore(f.read())

    loaded = payload.get('params', payload)
    if stats is None:
        stats = {}
    stats.setdefault('merged', 0)
    stats.setdefault('kept', 0)

    def keep(tpl):
        stats['kept'] += sum(1 for _ in jax.tree.leaves(tpl))
        return tpl

    def merge(tpl, got):
        if isinstance(tpl, dict) and isinstance(got, dict):
            return {k: merge(tpl[k], got[k]) if k in got else keep(tpl[k])
                    for k in tpl}
        if isinstance(tpl, (list, tuple)) and isinstance(got, (list, dict)):
            if isinstance(got, dict):  # msgpack may dict-ify lists
                got = [got.get(str(i)) for i in range(len(tpl))]
            # shorter saved list (architecture drift): keep template leaves
            # for the missing tail instead of raising
            got = list(got) + [None] * (len(tpl) - len(got))
            out = [keep(t) if g is None else merge(t, g)
                   for t, g in zip(tpl, got)]
            return type(tpl)(out) if isinstance(tpl, tuple) else out
        try:
            if np.shape(tpl) == np.shape(got):
                stats['merged'] += 1
                return jax.numpy.asarray(got)
        except Exception:
            pass
        return keep(tpl)

    merged = merge(params_template, loaded)
    if opt_state_template is not None and 'opt_state' in payload:
        opt = serialization.from_state_dict(opt_state_template,
                                            payload['opt_state'])
        return merged, opt, payload.get('step', 0)
    return merged
