"""Analytic + compiled FLOP/param counters.

Reference: compute_flop.py clones the models and runs thop.profile
(compute_flop.py:276-277). Here:
  * `count_params` walks the param pytree;
  * `analytic_flops` computes the closed-form MAC count of the flagship
    encoder/decoder (conv: 2*B*L*K*Cin*Cout per layer);
  * `compiled_flops` asks XLA's cost analysis for the exact compiled forward
    FLOPs — the ground truth the reference never had.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def count_params(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def analytic_flops(cfg, batch_size: int = 1) -> dict:
    """MAC-based forward FLOPs for the CNN flagship family."""
    B, L = batch_size, cfg.block_len
    k = cfg.enc_kernel_size

    def conv_stack(n_layers, cin, cout, ksize):
        f = 2 * B * L * ksize * cin * cout          # first layer
        f += (n_layers - 1) * 2 * B * L * ksize * cout * cout
        return f

    enc = 3 * (conv_stack(cfg.enc_num_layer, cfg.code_rate_k, cfg.enc_num_unit, k)
               + 2 * B * L * cfg.enc_num_unit * 1)
    n_in = 2 + cfg.num_iter_ft
    dec_half = conv_stack(cfg.dec_num_layer, n_in, cfg.dec_num_unit,
                          cfg.dec_kernel_size) \
        + 2 * B * L * cfg.dec_num_unit * cfg.num_iter_ft
    dec = 2 * cfg.num_iteration * dec_half
    return {'encoder_flops': enc, 'decoder_flops': dec,
            'total_flops': enc + dec}


def compiled_flops(fn, *example_args) -> float:
    """XLA cost-analysis FLOPs of the jitted fn at the example shapes."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get('flops', -1.0))


def report(cfg):
    """Print params + FLOPs for the configured model (compute_flop.py parity)."""
    from ..models.channel_ae import init_ae, make_perms, forward_ae
    key = jax.random.PRNGKey(0)
    params = init_ae(key, cfg)
    perms = make_perms(cfg)
    bits = jnp.zeros((1, cfg.block_len, cfg.code_rate_k))
    noise = jnp.zeros((1, cfg.block_len, cfg.code_rate_n))

    def fwd(params, bits, noise):
        out, codes, _ = forward_ae(params, cfg, key, bits, noise, perms,
                                   training=False)
        return out

    enc_params = count_params(params['enc'])
    dec_params = count_params(params['dec'])
    ana = analytic_flops(cfg)
    xla = compiled_flops(fwd, params, bits, noise)
    print(f'encoder params: {enc_params:,}')
    print(f'decoder params: {dec_params:,}')
    print(f'analytic fwd FLOPs/block: enc {ana["encoder_flops"]:,} '
          f'dec {ana["decoder_flops"]:,}')
    print(f'XLA compiled fwd FLOPs/block: {xla:,.0f}')
    return {'enc_params': enc_params, 'dec_params': dec_params,
            **ana, 'xla_flops': xla}
