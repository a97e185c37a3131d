"""Optimizers: Adam / SGD (+momentum) / Lookahead via optax.

Reference: main.py:199-213 selects torch Adam/SGD per enc/dec with separate
LRs; optimizers.py:10-74 implements Lookahead (k=5, alpha=0.5).

Lookahead is implemented here as a plain optax GradientTransformation that
keeps the slow weights in the optimizer state, so model params stay an
ordinary pytree (no LookaheadParams wrapper leaking into the train step).
Sync semantics match the reference exactly: the slow/fast sync fires on call
indices 0, k, 2k, ... (reference optimizers.py:35-43 syncs when its counter
is 0, which happens on the first step and every k-th step after).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def lookahead(inner: optax.GradientTransformation, k: int = 5,
              alpha: float = 0.5) -> optax.GradientTransformation:
    def init(params):
        # slow weights must be COPIES: jnp.asarray would alias the param
        # buffers, and the trainer donates params and opt_state to the same
        # jitted step (donating one buffer twice is an XLA error)
        return {'inner': inner.init(params),
                'slow': jax.tree.map(lambda x: jnp.array(x, copy=True), params),
                'count': jnp.zeros((), jnp.int32)}

    def update(updates, state, params=None):
        inner_updates, inner_state = inner.update(updates, state['inner'], params)
        fast = optax.apply_updates(params, inner_updates)
        sync = (state['count'] % k) == 0

        def do_sync(_):
            new_slow = jax.tree.map(lambda s, f: s + alpha * (f - s),
                                    state['slow'], fast)
            return new_slow, new_slow  # fast <- slow after sync

        def no_sync(_):
            return state['slow'], fast

        new_slow, new_fast = jax.lax.cond(sync, do_sync, no_sync, None)
        out_updates = jax.tree.map(lambda nf, p: nf - p, new_fast, params)
        return out_updates, {'inner': inner_state, 'slow': new_slow,
                             'count': state['count'] + 1}

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg, lr: float) -> optax.GradientTransformation:
    if cfg.optimizer == 'sgd':
        return optax.sgd(lr, momentum=cfg.momentum)
    if cfg.optimizer == 'lookahead':
        return lookahead(optax.adam(lr), k=5, alpha=0.5)
    return optax.adam(lr)
