"""Joint coding+modulation training loops.

Reference: mod_trainer.py:23-251 + main_modulation.py:98-279. Four phase
optimizers (enc/dec/mod/demod, main_modulation.py:212-252); noise is drawn in
SYMBOL space with shape (B, L*n/mod_rate, 2) (mod_trainer.py:55).
"""
from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..channels.noise import generate_noise, sample_noise, spec_from_cfg
from ..models.channel_ae import forward_mod_ae, init_mod_ae, make_perms
from ..utils import metrics as M
from .losses import customized_loss
from .optimizers import make_optimizer

_PHASE_KEYS = {'encoder': ('enc',), 'decoder': ('dec',),
               'mod': ('mod',), 'demod': ('demod',)}
_PHASE_LR = {'encoder': 'enc_lr', 'decoder': 'dec_lr',
             'mod': 'mod_lr', 'demod': 'demod_lr'}


class ModTrainer:
    def __init__(self, cfg, mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.mesh = mesh
        self.perms = make_perms(cfg)
        key = jax.random.PRNGKey(cfg.seed)
        self.key, init_key = jax.random.split(key)
        self.params = init_mod_ae(init_key, cfg)

        self.opts = {}
        self.opt_state = {}
        for phase, keys in _PHASE_KEYS.items():
            opt = make_optimizer(cfg, getattr(cfg, _PHASE_LR[phase]))
            self.opts[phase] = opt
            self.opt_state[phase] = opt.init({k: self.params[k] for k in keys})

        self._steps = {phase: jax.jit(partial(self._train_step, phase=phase))
                       for phase in _PHASE_KEYS}
        self._eval = jax.jit(self._eval_step)

    def _constrain(self, x):
        if self.mesh is not None:
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, P('data')))
        return x

    def _sym_shape(self):
        cfg = self.cfg
        return (cfg.batch_size, cfg.block_len * cfg.code_rate_n // cfg.mod_rate, 2)

    def _sample(self, key, phase):
        cfg = self.cfg
        k1, k2 = jax.random.split(key)
        bits = self._constrain(jax.random.bernoulli(
            k1, 0.5, (cfg.batch_size, cfg.block_len, cfg.code_rate_k)
        ).astype(jnp.float32))
        if phase == 'encoder':
            lo, hi = cfg.train_enc_channel_low, cfg.train_enc_channel_high
        else:
            lo, hi = cfg.train_dec_channel_low, cfg.train_dec_channel_high
        noise = self._constrain(generate_noise(
            k2, self._sym_shape(), cfg, snr_low=lo, snr_high=hi,
            mode='encoder' if phase == 'encoder' else 'decoder'))
        return bits, noise

    def _loss(self, diff, frozen, key, bits, noise):
        params = {**frozen, **diff}
        out, sym, _ = forward_mod_ae(params, self.cfg, key, bits, noise,
                                     self.perms, training=True)
        out = jnp.clip(out, 0.0, 1.0)
        return customized_loss(out, bits, self.cfg, code=sym)

    def _train_step(self, params, opt_state, key, *, phase):
        k_data, k_fwd = jax.random.split(key)
        bits, noise = self._sample(k_data, phase)
        keys = _PHASE_KEYS[phase]
        diff = {k: params[k] for k in keys}
        frozen = {k: params[k] for k in params if k not in keys}
        loss, grads = jax.value_and_grad(self._loss)(diff, frozen, k_fwd,
                                                     bits, noise)
        updates, new_opt = self.opts[phase].update(grads, opt_state[phase], diff)
        new_diff = jax.tree.map(lambda p, u: p + u, diff, updates)
        new_params = {**params, **new_diff}
        new_opt_state = dict(opt_state)
        new_opt_state[phase] = new_opt
        return new_params, new_opt_state, loss

    def train_epoch(self, epoch, phase='decoder', verbose=True):
        cfg = self.cfg
        n = max(1, cfg.num_block // cfg.batch_size)
        start = time.time()
        # keep per-step losses on device; one host sync at epoch end (a
        # float() per step would stall dispatch on the remote TPU tunnel)
        losses = []
        for _ in range(n):
            self.key, k = jax.random.split(self.key)
            self.params, self.opt_state, loss = self._steps[phase](
                self.params, self.opt_state, k)
            losses.append(loss)
        avg = float(jnp.mean(jnp.stack(losses)))
        if verbose:
            print(f'====> Epoch: {epoch} [{phase}] Average loss: {avg:.8f}'
                  f'  running time', time.time() - start)
        return avg

    def _eval_step(self, params, key, sigma):
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)
        bits = self._constrain(jax.random.bernoulli(
            k1, 0.5, (cfg.batch_size, cfg.block_len, cfg.code_rate_k)
        ).astype(jnp.float32))
        noise = self._constrain(sample_noise(k2, self._sym_shape(),
                                             spec_from_cfg(cfg), sigma))
        out, sym, _ = forward_mod_ae(params, cfg, k3, bits, noise, self.perms,
                                     training=False)
        return M.errors_ber(bits, out), M.errors_bler(bits, out)

    def test(self, verbose=True):
        cfg = self.cfg
        n = max(1, cfg.num_block // cfg.batch_size)
        interval = (cfg.snr_test_end - cfg.snr_test_start) / (cfg.snr_points - 1)
        snrs = [cfg.snr_test_start + interval * i for i in range(cfg.snr_points)]
        bers, blers = [], []
        for snr in snrs:
            sigma = M.snr_db2sigma(snr)
            acc = []
            for _ in range(n):
                self.key, k = jax.random.split(self.key)
                acc.append(self._eval(self.params, k, jnp.float32(sigma)))
            bers.append(float(jnp.mean(jnp.stack([a[0] for a in acc]))))
            blers.append(float(jnp.mean(jnp.stack([a[1] for a in acc]))))
            if verbose:
                print('Test SNR', snr, 'with ber ', bers[-1],
                      'with bler', blers[-1])
        if verbose:
            print('final results on SNRs ', snrs)
            print('BER', bers)
            print('BLER', blers)
        return snrs, bers, blers
