"""FTAE training / eval loops (reference ftae_trainer.py:19-171, ftae_main.py).

Same TPU-native structure as train/trainer.py: bits + forward-noise +
feedback-noise sampled on device inside one jitted step per phase. The
optimizer split follows ftae_main.py:87-92: the 'encoder' phase updates the
three forward encoders; the 'decoder' phase updates the feedback encoders AND
the decoder.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..channels.noise import generate_noise
from ..models.channel_ae import make_perms
from ..models.ftae import forward_ftae, init_ftae
from ..utils import metrics as M
from .losses import customized_loss
from .optimizers import make_optimizer

_ENC_KEYS = ('fwd_enc1', 'fwd_enc2', 'fwd_enc3')
_DEC_KEYS = ('fb_enc1', 'fb_enc2', 'dec')


def _split(params, keys):
    return {k: params[k] for k in keys}


class FTAETrainer:
    def __init__(self, cfg, mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.mesh = mesh
        self.perms = make_perms(cfg)
        key = jax.random.PRNGKey(cfg.seed)
        self.key, init_key = jax.random.split(key)
        self.params = init_ftae(init_key, cfg)

        self.opt_enc = make_optimizer(cfg, cfg.enc_lr)
        self.opt_dec = make_optimizer(cfg, cfg.dec_lr)
        self.opt_state = {
            'enc': self.opt_enc.init(_split(self.params, _ENC_KEYS)),
            'dec': self.opt_dec.init(_split(self.params, _DEC_KEYS)),
        }
        self._step_enc = jax.jit(partial(self._train_step, mode='encoder'))
        self._step_dec = jax.jit(partial(self._train_step, mode='decoder'))
        self._eval = jax.jit(self._eval_step)

    def _constrain(self, x):
        if self.mesh is not None:
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, P('data')))
        return x

    def _sample(self, key, mode):
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)
        bits = self._constrain(jax.random.bernoulli(
            k1, 0.5, (cfg.batch_size, cfg.block_len, cfg.code_rate_k)
        ).astype(jnp.float32))
        shape = (cfg.batch_size, cfg.block_len, 3)
        if mode == 'encoder':
            lo, hi = cfg.train_enc_channel_low, cfg.train_enc_channel_high
        else:
            lo, hi = cfg.train_dec_channel_low, cfg.train_dec_channel_high
        fwd_noise = self._constrain(generate_noise(
            k2, shape, cfg, snr_low=lo, snr_high=hi, mode=mode))
        fb_noise = self._constrain(generate_noise(
            k3, shape, cfg, snr_low=cfg.fb_channel_low,
            snr_high=cfg.fb_channel_high, mode='decoder'))
        return bits, fwd_noise, fb_noise

    def _loss(self, diff_params, frozen_params, bits, fwd_noise, fb_noise):
        params = {**frozen_params, **diff_params}
        out, codes = forward_ftae(params, self.cfg, bits, fwd_noise, fb_noise,
                                  self.perms)
        out = jnp.clip(out, 0.0, 1.0)
        return customized_loss(out, bits, self.cfg, code=codes)

    def _train_step(self, params, opt_state, key, *, mode):
        bits, fwd_noise, fb_noise = self._sample(key, mode)
        keys = _ENC_KEYS if mode == 'encoder' else _DEC_KEYS
        other = _DEC_KEYS if mode == 'encoder' else _ENC_KEYS
        opt = self.opt_enc if mode == 'encoder' else self.opt_dec
        st = 'enc' if mode == 'encoder' else 'dec'

        diff = _split(params, keys)
        frozen = _split(params, other)
        loss, grads = jax.value_and_grad(self._loss)(diff, frozen, bits,
                                                     fwd_noise, fb_noise)
        updates, new_opt = opt.update(grads, opt_state[st], diff)
        new_diff = jax.tree.map(lambda p, u: p + u, diff, updates)
        new_params = {**params, **new_diff}
        new_opt_state = dict(opt_state)
        new_opt_state[st] = new_opt
        return new_params, new_opt_state, loss

    def train_epoch(self, epoch, mode='encoder', verbose=True):
        cfg = self.cfg
        step = self._step_enc if mode == 'encoder' else self._step_dec
        n = max(1, cfg.num_block // cfg.batch_size)
        start = time.time()
        # keep per-step losses on device; one host sync at epoch end (a
        # float() per step would stall dispatch on the remote TPU tunnel)
        losses = []
        for _ in range(n):
            self.key, k = jax.random.split(self.key)
            self.params, self.opt_state, loss = step(self.params,
                                                     self.opt_state, k)
            losses.append(loss)
        avg = float(jnp.mean(jnp.stack(losses)))
        if verbose:
            print(f'====> Epoch: {epoch} Average loss: {avg:.8f}  running time',
                  time.time() - start)
        return avg

    def _eval_step(self, params, key, sigma):
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)
        bits = self._constrain(jax.random.bernoulli(
            k1, 0.5, (cfg.batch_size, cfg.block_len, cfg.code_rate_k)
        ).astype(jnp.float32))
        from ..channels.noise import sample_noise, spec_from_cfg
        shape = (cfg.batch_size, cfg.block_len, 3)
        fwd_noise = self._constrain(sample_noise(k2, shape, spec_from_cfg(cfg), sigma))
        fb_noise = self._constrain(generate_noise(
            k3, shape, cfg, snr_low=cfg.fb_channel_low,
            snr_high=cfg.fb_channel_high, mode='decoder'))
        out, codes = forward_ftae(params, cfg, bits, fwd_noise, fb_noise,
                                  self.perms)
        return M.errors_ber(bits, out), M.errors_bler(bits, out)

    def _sweep_chunk(self, chunk: int):
        """`chunk` eval batches fused into one lax.scan dispatch, exact error
        counts — same fast-eval pattern as Trainer._sweep_chunk."""
        from ..channels.noise import sample_noise, spec_from_cfg
        cfg = self.cfg
        spec = spec_from_cfg(cfg)
        shape = (cfg.batch_size, cfg.block_len, 3)

        def chunk_fn(params, key, sigma):
            def body(carry, _):
                key, bit_e, blk_e = carry
                key, k = jax.random.split(key)
                k1, k2, k3 = jax.random.split(k, 3)
                bits = self._constrain(jax.random.bernoulli(
                    k1, 0.5, (cfg.batch_size, cfg.block_len, cfg.code_rate_k)
                ).astype(jnp.float32))
                fwd_noise = self._constrain(
                    sample_noise(k2, shape, spec, sigma))
                fb_noise = self._constrain(generate_noise(
                    k3, shape, cfg, snr_low=cfg.fb_channel_low,
                    snr_high=cfg.fb_channel_high, mode='decoder'))
                out, _ = forward_ftae(params, cfg, bits, fwd_noise, fb_noise,
                                      self.perms)
                t = jnp.round(bits.reshape(bits.shape[0], -1))
                p = jnp.round(out.astype(jnp.float32).reshape(out.shape[0], -1))
                err = jnp.not_equal(t, p)
                bit_e = bit_e + jnp.sum(err).astype(jnp.int32)
                blk_e = blk_e + jnp.sum(jnp.any(err, axis=1)).astype(jnp.int32)
                return (key, bit_e, blk_e), None

            init = (key, jnp.int32(0), jnp.int32(0))
            (key, bit_e, blk_e), _ = jax.lax.scan(body, init, None,
                                                  length=chunk)
            return key, bit_e, blk_e

        if not hasattr(self, '_sweep_chunks'):
            self._sweep_chunks = {}
        # keyed by (chunk, cfg): chunk_fn closes over self.cfg at build time
        # and callers mutate trainer.cfg between sweeps (see Trainer._sweep_chunk)
        cache_key = (chunk, cfg)
        if cache_key not in self._sweep_chunks:
            self._sweep_chunks[cache_key] = jax.jit(chunk_fn)
        return self._sweep_chunks[cache_key]

    def sweep(self, snrs, num_block: int = None, chunk: int = 50,
              verbose: bool = True):
        """Fast SNR sweep with exact bit/block error counts (AWGN-family
        forward channel at sigma = snr_db2sigma(snr); feedback noise stays at
        the configured fb channel range, as in test())."""
        cfg = self.cfg
        num_block = num_block or cfg.num_block
        num_batches = max(1, num_block // cfg.batch_size)
        res = {'snr': list(snrs), 'ber': [], 'bler': [], 'bit_errors': [],
               'blk_errors': [],
               'n_bits': num_batches * cfg.batch_size * cfg.block_len
               * cfg.code_rate_k,
               'n_blocks': num_batches * cfg.batch_size}
        import numpy as np
        for snr in snrs:
            sigma = M.snr_db2sigma(snr)
            bit_e = blk_e = 0
            left = num_batches
            self.key, k = jax.random.split(self.key)
            while left > 0:
                n = min(left, chunk)
                step = self._sweep_chunk(n)
                k, be, ke = step(self.params, k, jnp.float32(sigma))
                bit_e += int(be); blk_e += int(ke)
                left -= n
            res['ber'].append(bit_e / res['n_bits'])
            res['bler'].append(blk_e / res['n_blocks'])
            res['bit_errors'].append(bit_e)
            res['blk_errors'].append(blk_e)
            if verbose:
                print(f'Test SNR {snr} with ber {res["ber"][-1]:.6e} '
                      f'({bit_e} bit errs) with bler {res["bler"][-1]:.6e} '
                      f'({blk_e} blk errs)', flush=True)
        return res

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
                print('Test SNR', snr, 'with ber ', bers[-1], 'with bler', blers[-1])
        if verbose:
            print('final results on SNRs ', snrs)
            print('BER', bers)
            print('BLER', blers)
        return snrs, bers, blers
