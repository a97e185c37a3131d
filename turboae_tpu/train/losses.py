"""Loss menu (reference loss.py:30-109). BCE is the one that matters; the
rest are preserved for flag parity."""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7  # must exceed f32 ulp at 1.0 (1e-10 rounds 1-eps to exactly 1.0
             # and log(1-o) becomes -inf once the decoder saturates)


def _bce_elementwise(output, target):
    o = jnp.clip(output, _EPS, 1.0 - _EPS)
    # clamp each log at -100 like torch's F.binary_cross_entropy, bounding
    # the loss (and its gradient) when predictions saturate
    log_o = jnp.maximum(jnp.log(o), -100.0)
    log_1mo = jnp.maximum(jnp.log(1.0 - o), -100.0)
    return -(target * log_o + (1.0 - target) * log_1mo)


def customized_loss(output, x_train, cfg, code=None):
    output = jnp.clip(output, 0.0, 1.0)
    loss_name = cfg.loss

    if loss_name == 'bce':
        return jnp.mean(_bce_elementwise(output, x_train))

    if loss_name == 'soft_ber':
        return jnp.mean(((1.0 - output) ** x_train) * (output ** (1.0 - x_train)))

    if loss_name == 'bce_rl':
        bce = _bce_elementwise(output, x_train)
        ber = jnp.not_equal(jnp.round(output), jnp.round(x_train)).astype(jnp.float32)
        ber_centered = ber - jnp.mean(ber)
        return cfg.ber_lambda * jnp.mean(ber_centered * bce) + cfg.bce_lambda * jnp.mean(bce)

    if loss_name == 'enc_rl':
        ber = jax.lax.stop_gradient(
            jnp.not_equal(jnp.round(output), jnp.round(x_train)).astype(jnp.float32))
        return jnp.mean(ber * jnp.abs(code))

    if loss_name == 'bce_block':
        bce = _bce_elementwise(output, x_train)
        return jnp.mean(jnp.max(bce, axis=1))

    if loss_name == 'focal':
        bce = _bce_elementwise(output, x_train)
        pt = jnp.exp(-bce)
        return jnp.mean(cfg.focal_alpha * (1 - pt) ** cfg.focal_gamma * bce)

    if loss_name == 'mse':
        # clip both tails: output==0.0 would give log(0) = -inf (same
        # saturation failure as BCE — see _bce_elementwise)
        o = jnp.clip(output, _EPS, 1.0 - _EPS)
        logit = jnp.log(o / (1.0 - o))
        return jnp.mean((logit - x_train) ** 2)

    if loss_name == 'maxBCE':
        bce = _bce_elementwise(output, x_train)
        pos_loss = jnp.mean(bce, axis=0)
        return jnp.mean(bce) + cfg.lambda_maxBCE * jnp.mean(jnp.max(pos_loss, axis=0))

    if loss_name == 'sortBCE':
        bce = _bce_elementwise(output, x_train)
        pos_loss = jnp.mean(bce, axis=0)
        top = jax.lax.top_k(pos_loss.reshape(-1), 5)[0]
        return jnp.mean(bce) + cfg.lambda_maxBCE * jnp.sum(top)

    raise ValueError(f'unknown loss {loss_name}')
