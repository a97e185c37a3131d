"""BCJR / MAP decoding.

Host oracle: probability-domain recursions with per-step normalization,
semantically identical to the reference (commpy/channelcoding/turbo.py:63-259)
but vectorized over states (the reference loops Python-per-(state, input); its
ancestors were Cython — SURVEY.md rows 24). Optional C++ fast path in
turboae_tpu/native is cross-validated against this.

TPU path: LOG-domain forward/backward recursions as lax.scan over time with
logsumexp, batched over blocks. Probability-domain underflows for long blocks
(the reference renormalizes every step to survive); log-domain is the
numerically-correct TPU formulation and matches the oracle's LLRs to ~1e-4.
"""
from __future__ import annotations

import numpy as np

from .trellis import Trellis


def _gammas(trellis: Trellis, sys_symbols, non_sys_symbols, noise_variance,
            priors):
    """Branch probabilities gamma[t, s, u] (reference turbo.py:63-116).

    priors: (2, L) input prior probabilities.
    Returns (L, S, U) branch probs INCLUDING the prior factor NOT applied
    (the recursions apply priors separately, matching the reference).
    """
    obits = trellis.output_bits()            # (S, U, n) with n=2
    msg_bit = 2.0 * obits[:, :, 0] - 1.0     # (S, U)
    par_bit = 2.0 * obits[:, :, 1] - 1.0
    L = len(sys_symbols)
    x = sys_symbols[:, None, None] - msg_bit[None]       # (L, S, U)
    y = non_sys_symbols[:, None, None] - par_bit[None]
    return np.exp(-(x * x + y * y) / (2.0 * noise_variance))


def map_decode(sys_symbols, non_sys_symbols, trellis: Trellis,
               noise_variance, L_int, mode: str = 'decode'):
    """MAP decoder returning [L_ext, decoded_bits] (reference turbo.py:171-259).

    NOTE the reference's "L_ext" is actually the full a-posteriori LLR
    (L_int + log(app1/app0), turbo.py:153) — callers subtract L_int; kept.
    """
    S = trellis.number_states
    U = trellis.number_inputs
    nst = trellis.next_state_table
    L = len(sys_symbols)

    priors = np.empty((2, L))
    priors[0] = 1.0 / (1.0 + np.exp(L_int))
    priors[1] = 1.0 - priors[0]

    gamma = _gammas(trellis, np.asarray(sys_symbols, float),
                    np.asarray(non_sys_symbols, float), noise_variance, priors)

    # backward: beta[t, s], beta[L] = 1 (turbo.py:86-119)
    beta = np.zeros((L + 1, S))
    beta[L] = 1.0
    for t in range(L - 1, -1, -1):
        # beta[t, s] = sum_u beta[t+1, nst[s,u]] * gamma[t,s,u] * prior[u,t]
        b = beta[t + 1][nst] * gamma[t] * priors[:, t][None, :]
        beta[t] = b.sum(axis=1)
        beta[t] /= beta[t].sum()

    # forward + APP extraction (turbo.py:122-166)
    alpha = np.zeros(S)
    alpha[0] = 1.0
    L_ext = np.zeros(L)
    decoded = np.zeros(L, 'int')
    for t in range(L):
        contrib = alpha[:, None] * gamma[t]              # (S, U)
        app = (contrib * beta[t + 1][nst]).sum(axis=0)   # (U,)
        lappr = L_int[t] + np.log(app[1] / app[0])
        L_ext[t] = lappr
        if mode == 'decode':
            decoded[t] = 1 if lappr > 0 else 0
        new_alpha = np.zeros(S)
        np.add.at(new_alpha, nst.reshape(-1),
                  (contrib * priors[:, t][None, :]).reshape(-1))
        alpha = new_alpha / new_alpha.sum()

    return [L_ext, decoded]


# ---------------------------------------------------------------------------
# TPU path: batched log-domain BCJR
# ---------------------------------------------------------------------------

def make_jax_map_decoder(trellis: Trellis):
    """Returns jittable fn (sys (B,L), par (B,L), noise_var, L_int (B,L)) ->
    L_post (B,L) full a-posteriori LLRs (same convention as map_decode's
    first return)."""
    import jax
    import jax.numpy as jnp

    S = trellis.number_states
    nst = jnp.asarray(trellis.next_state_table)          # (S, U)
    obits = trellis.output_bits()
    msg_sym = jnp.asarray(2.0 * obits[:, :, 0] - 1.0)    # (S, U)
    par_sym = jnp.asarray(2.0 * obits[:, :, 1] - 1.0)

    NEG = jnp.float32(-1e30)

    def decode(sys_symbols, non_sys_symbols, noise_variance, L_int):
        B, L = sys_symbols.shape
        inv2v = 1.0 / (2.0 * noise_variance)

        # log branch metrics (B, L, S, U)
        x = sys_symbols[:, :, None, None] - msg_sym[None, None]
        y = non_sys_symbols[:, :, None, None] - par_sym[None, None]
        log_gamma = -(x * x + y * y) * inv2v

        # log priors (B, L, U)
        lp1 = -jax.nn.softplus(-L_int)                   # log sigmoid(L_int) = log P(u=1)
        lp0 = -jax.nn.softplus(L_int)
        log_prior = jnp.stack([lp0, lp1], axis=-1)

        lg_t = jnp.swapaxes(log_gamma, 0, 1)             # (L, B, S, U)
        lp_t = jnp.swapaxes(log_prior, 0, 1)             # (L, B, U)

        # backward: lbeta[t, s] = logsumexp_u lbeta[t+1, nst[s,u]] + lg + lp
        def bwd(lbeta_next, xs):
            lg, lp = xs
            terms = lbeta_next[:, nst] + lg + lp[:, None, :]   # (B, S, U)
            lbeta = jax.nn.logsumexp(terms, axis=-1)
            lbeta = lbeta - jax.nn.logsumexp(lbeta, axis=-1, keepdims=True)
            return lbeta, lbeta

        lbeta_T = jnp.zeros((B, S))
        _, lbetas = jax.lax.scan(bwd, lbeta_T, (lg_t, lp_t), reverse=True)
        # lbetas[t] = lbeta at time t computed from t+1 — i.e. beta_{t}? scan
        # with reverse emits y_t = lbeta computed at step t, which corresponds
        # to beta_t (a function of inputs t..L-1). For the APP at time t we
        # need beta_{t+1}: shift left, last = terminal zeros.
        lbeta_next = jnp.concatenate(
            [lbetas[1:], jnp.zeros((1, B, S))], axis=0)       # (L, B, S)

        # forward + APP
        lalpha0 = jnp.full((B, S), NEG).at[:, 0].set(0.0)

        def fwd(lalpha, xs):
            lg, lp, lbn = xs
            contrib = lalpha[:, :, None] + lg                 # (B, S, U)
            app = jax.nn.logsumexp(contrib + lbn[:, nst], axis=1)  # (B, U)
            # new_alpha[s'] = logsumexp over (s,u) with nst[s,u]==s'
            terms = contrib + lp[:, None, :]
            flat = terms.reshape(B, -1)
            tgt = nst.reshape(-1)
            # segment logsumexp via max-shift scatter-add
            m = jnp.max(flat, axis=-1, keepdims=True)
            e = jnp.exp(flat - m)
            summed = jnp.zeros((B, S)).at[:, tgt].add(e)
            new_lalpha = jnp.log(summed + 1e-38) + m
            new_lalpha = new_lalpha - jax.nn.logsumexp(new_lalpha, axis=-1,
                                                       keepdims=True)
            return new_lalpha, app

        _, apps = jax.lax.scan(fwd, lalpha0, (lg_t, lp_t, lbeta_next))
        apps = jnp.swapaxes(apps, 0, 1)                       # (B, L, U)
        return L_int + apps[:, :, 1] - apps[:, :, 0]

    return decode
