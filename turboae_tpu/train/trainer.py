"""Training / validation / test loops — jit-compiled, mesh-shardable.

Reference: trainer.py:23-248 and the epoch orchestration in main.py:220-237.

TPU-native redesign, versus the reference's per-batch host work:
  - bits AND noise are sampled ON DEVICE inside the jitted step (the reference
    builds both on host with torch/numpy and ships them over PCIe each batch,
    trainer.py:53-62);
  - one fused XLA program per phase covers sample -> encode -> channel ->
    decode -> loss -> backward -> optimizer update;
  - the encoder phase differentiates w.r.t. encoder params only and the
    decoder phase w.r.t. decoder params only (the alternating schedule of
    main.py:220-233), letting XLA DCE the unused halves of the backward pass;
  - under a Mesh, batches are sharded over the 'data' axis with
    with_sharding_constraint; metric sums and the power-constraint stats
    become psum collectives inserted by GSPMD — no hand-written comms.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..channels.noise import generate_noise
from ..models.channel_ae import forward_ae, init_ae, make_perms
from ..utils import metrics as M
from .losses import customized_loss
from .optimizers import make_optimizer


def _sample_bits(key, shape):
    """Fresh random bits each batch, on device (reference trainer.py:53)."""
    return jax.random.bernoulli(key, 0.5, shape).astype(jnp.float32)


def _check_legacy_noise_channel(channel: str) -> None:
    """legacy_noise scales ONE unit realization by each point's sigma. That
    only reproduces fresh-noise statistics when the noise is purely
    multiplicative in sigma (awgn, t-dist). Mask channels (bec/bsc/ge) would
    get nonsense fractional masks, and mixed fixed-power channels
    (radar, ge_awgn) would have their fixed components (e.g. radar bursts at
    radar_power) wrongly scaled with sigma."""
    if channel not in ('awgn', 't-dist'):
        raise ValueError(
            f'legacy_noise is only defined for awgn/t-dist channels '
            f'(noise purely multiplicative in sigma), got {channel!r}')


class Trainer:
    def __init__(self, cfg, mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.mesh = mesh
        self.perms = make_perms(cfg)
        key = jax.random.PRNGKey(cfg.seed)
        self.key, init_key = jax.random.split(key)
        self.params = init_ae(init_key, cfg)
        # host-side RNG for variable-block-len schedules / interleaver seeds:
        # seeded so runs with the same cfg.seed are reproducible
        self._np_rng = np.random.RandomState(cfg.seed)

        self.opt_enc = make_optimizer(cfg, cfg.enc_lr)
        self.opt_dec = make_optimizer(cfg, cfg.dec_lr)
        self.opt_state = {'enc': self.opt_enc.init(self.params['enc']),
                          'dec': self.opt_dec.init(self.params['dec'])}

        # donate params/opt_state so XLA updates them in place (no copy of the
        # 31MB param tree per step)
        self._step_enc = jax.jit(partial(self._train_step, mode='encoder'),
                                 donate_argnums=(0, 1))
        self._step_dec = jax.jit(partial(self._train_step, mode='decoder'),
                                 donate_argnums=(0, 1))
        self._step_joint = jax.jit(partial(self._train_step, mode='joint'),
                                   donate_argnums=(0, 1))
        # variable-block-len: per-(mode, length) jitted steps, built lazily
        self._vbl_steps = {}
        self._vbl_perms = {}
        # multi-step programs (lax.scan over optimizer steps), built lazily
        # per (mode, n): one dispatch covers n steps — the per-step host
        # round trip over the remote TPU tunnel is pure overhead otherwise
        self._multi_steps = {}
        self._eval = jax.jit(self._eval_step)
        self._eval_fix = jax.jit(self._eval_fixed)
        self._evalp = jax.jit(self._eval_punc)
        self._val = jax.jit(self._val_step)
        # fast count-based sweep programs, built lazily per chunk length
        self._sweep_chunks = {}
        self.norm_stats = None

    # -------------------------------------------------------------
    def _constrain(self, x):
        """Shard the (B, L, C) batch over the mesh: 'batch' puts blocks on the
        'data' axis (DP — blocks are independent); 'time' shards the block/time
        axis (SP — the interleaver permutation lowers to an all-to-all and the
        same-shape convs get GSPMD halo exchange; for very long blocks)."""
        if self.mesh is not None:
            if self.cfg.shard_axis == 'time':
                spec = P(None, 'data')
            else:
                spec = P('data')
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, spec))
        return x

    def _sample_batch(self, key, mode, bits_key=None):
        """bits_key overrides the bit-sampling key so the encoder phase can
        reuse the same codewords for k consecutive steps while noise stays
        fresh (is_k_same_code, reference trainer.py:43-51)."""
        cfg = self.cfg
        k_bits, k_noise = jax.random.split(key)
        if bits_key is not None:
            k_bits = bits_key
        bits = self._constrain(_sample_bits(
            k_bits, (cfg.batch_size, cfg.block_len, cfg.code_rate_k)))
        noise_shape = (cfg.batch_size, cfg.block_len, cfg.code_rate_n)
        if mode == 'encoder':
            lo, hi = cfg.train_enc_channel_low, cfg.train_enc_channel_high
        else:
            lo, hi = cfg.train_dec_channel_low, cfg.train_dec_channel_high
        noise = self._constrain(generate_noise(
            k_noise, noise_shape, cfg, snr_low=lo, snr_high=hi, mode=mode))
        return bits, noise

    def _loss(self, diff_params, frozen_params, merge, key, bits, noise):
        params = merge(diff_params, frozen_params)
        out, code, _ = forward_ae(params, self.cfg, key, bits, noise, self.perms,
                                  training=True)
        out = jnp.clip(out, 0.0, 1.0)
        return customized_loss(out, bits, self.cfg, code=code)

    def _train_step(self, params, opt_state, key, bits_key=None, *, mode):
        k_data, k_fwd = jax.random.split(key)
        bits, noise = self._sample_batch(k_data, mode, bits_key)

        if mode == 'encoder':
            merge = lambda d, f: {'enc': d, 'dec': f}
            loss, grads = jax.value_and_grad(self._loss)(
                params['enc'], params['dec'], merge, k_fwd, bits, noise)
            updates, new_opt = self.opt_enc.update(grads, opt_state['enc'], params['enc'])
            new_params = {'enc': jax.tree.map(lambda p, u: p + u, params['enc'], updates),
                          'dec': params['dec']}
            new_opt_state = {'enc': new_opt, 'dec': opt_state['dec']}
        elif mode == 'decoder':
            merge = lambda d, f: {'enc': f, 'dec': d}
            loss, grads = jax.value_and_grad(self._loss)(
                params['dec'], params['enc'], merge, k_fwd, bits, noise)
            updates, new_opt = self.opt_dec.update(grads, opt_state['dec'], params['dec'])
            new_params = {'enc': params['enc'],
                          'dec': jax.tree.map(lambda p, u: p + u, params['dec'], updates)}
            new_opt_state = {'enc': opt_state['enc'], 'dec': new_opt}
        else:  # joint: one step updates both with their own optimizers
            merge = lambda d, f: d
            loss, grads = jax.value_and_grad(self._loss)(
                params, None, merge, k_fwd, bits, noise)
            up_e, no_e = self.opt_enc.update(grads['enc'], opt_state['enc'], params['enc'])
            up_d, no_d = self.opt_dec.update(grads['dec'], opt_state['dec'], params['dec'])
            new_params = {'enc': jax.tree.map(lambda p, u: p + u, params['enc'], up_e),
                          'dec': jax.tree.map(lambda p, u: p + u, params['dec'], up_d)}
            new_opt_state = {'enc': no_e, 'dec': no_d}

        return new_params, new_opt_state, loss

    def _multi_step(self, mode: str, n: int):
        """One jitted program running n optimizer steps via lax.scan.

        Bit-identical to n sequential _train_step calls: the scan carries the
        PRNG key and applies the same split-per-step chain the host loop
        does, so losses/params match the single-step path exactly."""
        key = (mode, n)
        if key not in self._multi_steps:
            def many(params, opt_state, master_key):
                def body(carry, _):
                    params, opt_state, k = carry
                    # same split-per-step chain as the host loop:
                    # self.key, kstep = jax.random.split(self.key)
                    k, kstep = jax.random.split(k)
                    params, opt_state, loss = self._train_step(
                        params, opt_state, kstep, mode=mode)
                    return (params, opt_state, k), loss
                (params, opt_state, master_key), losses = jax.lax.scan(
                    body, (params, opt_state, master_key), None, length=n)
                return params, opt_state, master_key, losses
            self._multi_steps[key] = jax.jit(many, donate_argnums=(0, 1))
        return self._multi_steps[key]

    # -------------------------------------------------------------
    def _vbl_buckets(self, n_buckets: int = 8):
        """Quantize [block_len_low, block_len_high) into <= n_buckets lengths
        so variable-block-len training (reference trainer.py:36-39) compiles a
        bounded number of XLA programs instead of one per length."""
        cfg = self.cfg
        lo, hi = cfg.block_len_low, cfg.block_len_high
        lens = sorted(set(np.linspace(lo, hi - 1, n_buckets).astype(int).tolist()))
        return lens

    def _vbl_step(self, mode: str, block_len: int):
        key = (mode, block_len)
        if key not in self._vbl_steps:
            cfg_l = self.cfg.replace(block_len=block_len)
            # a minimal immutable snapshot: the jitted step closure reads ONLY
            # cfg/perms/mesh/optimizers, so share exactly those — sharing the
            # whole __dict__ would alias mutable state (params, key, ...)
            # across per-length closures
            sub = Trainer.__new__(Trainer)
            sub.cfg = cfg_l
            sub.mesh = self.mesh
            sub.opt_enc = self.opt_enc
            sub.opt_dec = self.opt_dec
            # reference draws a fresh interleaver seed in [0, is_interleave)
            # per forward (encoders.py:353-360); we fix one per length bucket
            # (identical distribution over training, static under jit)
            from ..models.channel_ae import make_perms
            seed = int(self._np_rng.randint(0, max(1, self.cfg.is_interleave)))
            sub.perms = make_perms(cfg_l, block_len=block_len, seed=seed)
            self._vbl_perms[block_len] = sub.perms
            self._vbl_steps[key] = jax.jit(partial(sub._train_step, mode=mode),
                                           donate_argnums=(0, 1))
        return self._vbl_steps[key]

    def train_epoch(self, epoch: int, mode: str = 'encoder', verbose: bool = True):
        """One epoch = num_block/batch_size optimizer steps (trainer.py:33)."""
        cfg = self.cfg
        num_batches = max(1, cfg.num_block // cfg.batch_size)
        start = time.time()
        # keep per-step losses on device and sync ONCE at epoch end: a
        # float() per step would block dispatch on a host round trip (over
        # the remote TPU tunnel that halves throughput)
        losses = []
        if cfg.is_variable_block_len:
            buckets = self._vbl_buckets()
            for _ in range(num_batches):
                L = int(self._np_rng.choice(buckets))
                step = self._vbl_step(mode, L)
                self.key, k = jax.random.split(self.key)
                self.params, self.opt_state, loss = step(self.params,
                                                         self.opt_state, k)
                losses.append(loss)
        else:
            step = {'encoder': self._step_enc, 'decoder': self._step_dec,
                    'joint': self._step_joint}[mode]
            same_code = cfg.is_k_same_code and mode == 'encoder'
            bits_key = None
            if cfg.steps_per_call > 1 and not same_code:
                # fused multi-step path: one dispatch per steps_per_call
                # optimizer steps (identical numerics — see _multi_step)
                n_groups, rem = divmod(num_batches, cfg.steps_per_call)
                if n_groups:
                    many = self._multi_step(mode, cfg.steps_per_call)
                    for _ in range(n_groups):
                        self.params, self.opt_state, self.key, ls = many(
                            self.params, self.opt_state, self.key)
                        losses.append(ls)  # per-step losses, shape (n,)
                for _ in range(rem):
                    self.key, k = jax.random.split(self.key)
                    self.params, self.opt_state, loss = step(
                        self.params, self.opt_state, k)
                    losses.append(loss)
            else:
                for i in range(num_batches):
                    self.key, k = jax.random.split(self.key)
                    if same_code:
                        if i % cfg.k_same_code == 0:
                            self.key, bits_key = jax.random.split(self.key)
                        self.params, self.opt_state, loss = step(
                            self.params, self.opt_state, k, bits_key)
                    else:
                        self.params, self.opt_state, loss = step(self.params,
                                                                 self.opt_state, k)
                    losses.append(loss)
        avg = float(jnp.mean(jnp.concatenate(
            [jnp.atleast_1d(l) for l in losses])))
        if verbose:
            print(f'====> Epoch: {epoch} Average loss: {avg:.8f}  running time',
                  time.time() - start)
        return avg

    # -------------------------------------------------------------
    def _val_step(self, params, key):
        cfg = self.cfg
        k_bits, k_noise, k_fwd = jax.random.split(key, 3)
        bits = self._constrain(_sample_bits(
            k_bits, (cfg.batch_size, cfg.block_len, cfg.code_rate_k)))
        noise = self._constrain(generate_noise(
            k_noise, (cfg.batch_size, cfg.block_len, cfg.code_rate_n), cfg,
            snr_low=cfg.train_enc_channel_low, snr_high=cfg.train_enc_channel_low))
        out, code, _ = forward_ae(params, cfg, k_fwd, bits, noise, self.perms,
                                  training=False)
        out = jnp.clip(out, 0.0, 1.0)
        bce = customized_loss(out, bits, cfg.replace(loss='bce'), code=code)
        custom = customized_loss(out, bits, cfg, code=code)
        ber = M.errors_ber(bits, out)
        return bce, custom, ber

    def validate(self, verbose: bool = True):
        """Validation at the encoder-train SNR (reference trainer.py:88-132)."""
        cfg = self.cfg
        n = max(1, int(cfg.num_block / cfg.batch_size * cfg.test_ratio))
        acc = []
        for _ in range(n):
            self.key, k = jax.random.split(self.key)
            acc.append(self._val(self.params, k))
        bce = float(jnp.mean(jnp.stack([a[0] for a in acc])))
        custom = float(jnp.mean(jnp.stack([a[1] for a in acc])))
        ber = float(jnp.mean(jnp.stack([a[2] for a in acc])))
        if verbose:
            print('====> Test set BCE loss', bce, 'Custom Loss', custom,
                  'with ber ', ber)
        return bce, ber

    # -------------------------------------------------------------
    def _eval_step(self, params, key, sigma, stats=None):
        """One test batch at a given noise sigma. sigma is a traced scalar so
        the whole SNR sweep reuses ONE compiled program (the reference
        recompiles nothing but pays per-batch host RNG + transfers instead).

        `stats` threads the precomputed-norm running average through the sweep
        (reference encoders.py:110-114 keeps accumulating during test)."""
        cfg = self.cfg
        k_bits, k_noise, k_fwd = jax.random.split(key, 3)
        bits = self._constrain(_sample_bits(
            k_bits, (cfg.batch_size, cfg.block_len, cfg.code_rate_k)))
        from ..channels.noise import sample_noise, spec_from_cfg
        noise = self._constrain(sample_noise(
            k_noise, (cfg.batch_size, cfg.block_len, cfg.code_rate_n),
            spec_from_cfg(cfg), sigma))
        out, code, stats = forward_ae(params, cfg, k_fwd, bits, noise,
                                      self.perms, training=False, stats=stats)
        return (M.errors_ber(bits, out), M.errors_bler(bits, out),
                M.errors_ber_pos(bits, out), M.code_power(code)), stats

    def _eval_fixed(self, params, key, noise, stats=None):
        """Eval batch with a CALLER-SUPPLIED noise tensor (fresh bits).

        Implements the pre-2022 reference test bug (README.md:2: performance
        was "measured on fixed noise rather than random noise"): the noise
        realization is drawn once and reused across batches, only bits
        resample. Used by test() when cfg.legacy_noise."""
        cfg = self.cfg
        k_bits, _, k_fwd = jax.random.split(key, 3)
        bits = self._constrain(_sample_bits(
            k_bits, (cfg.batch_size, cfg.block_len, cfg.code_rate_k)))
        out, code, stats = forward_ae(params, cfg, k_fwd, bits,
                                      self._constrain(noise), self.perms,
                                      training=False, stats=stats)
        return (M.errors_ber(bits, out), M.errors_bler(bits, out),
                M.errors_ber_pos(bits, out), M.code_power(code)), stats

    def _eval_punc(self, params, key, sigma, punc_mask, stats=None):
        """Punctured-metric eval batch (reference trainer.py:194-213)."""
        cfg = self.cfg
        k_bits, k_noise, k_fwd = jax.random.split(key, 3)
        bits = self._constrain(_sample_bits(
            k_bits, (cfg.batch_size, cfg.block_len, cfg.code_rate_k)))
        from ..channels.noise import sample_noise, spec_from_cfg
        noise = self._constrain(sample_noise(
            k_noise, (cfg.batch_size, cfg.block_len, cfg.code_rate_n),
            spec_from_cfg(cfg), sigma))
        out, _, stats = forward_ae(params, cfg, k_fwd, bits, noise, self.perms,
                                   training=False, stats=stats)
        return (M.errors_ber_punctured(bits, out, punc_mask),
                M.errors_bler(bits, out, punc_mask)), stats

    # -------------------------------------------------------------
    def _sweep_chunk(self, chunk: int):
        """One jitted program = `chunk` eval batches at a traced sigma, fused
        into a lax.scan, returning EXACT error counts (int32) instead of
        per-batch float means.

        This is the deep-statistics eval path (1e6+ blocks/point): one device
        dispatch covers `chunk` batches (the per-batch host round trip over
        the remote TPU tunnel is the binding cost of `test()`), the forward
        runs in cfg.dtype (bfloat16 for 2x the eval rate — decisions are
        round()ed so bf16 is exact at the metric level), and the returned
        bit/block/positional error COUNTS support Wilson CIs without any
        mean-of-means precision loss. `fixed_noise` (optional) reuses one
        noise realization for every batch — the actual pre-2022 reference
        test bug (/root/reference/README.md:2), see test(legacy).
        """
        from ..channels.noise import sample_noise, spec_from_cfg
        cfg = self.cfg
        spec = spec_from_cfg(cfg)
        noise_shape = (cfg.batch_size, cfg.block_len, cfg.code_rate_n)

        def chunk_fn(params, key, sigma, fixed_noise=None):
            def body(carry, _):
                key, bit_e, blk_e, pos_e = carry
                key, k = jax.random.split(key)
                k_bits, k_noise, k_fwd = jax.random.split(k, 3)
                bits = self._constrain(_sample_bits(
                    k_bits, (cfg.batch_size, cfg.block_len, cfg.code_rate_k)))
                if fixed_noise is None:
                    noise = self._constrain(
                        sample_noise(k_noise, noise_shape, spec, sigma))
                else:
                    noise = self._constrain(sigma * fixed_noise)
                out, _, _ = forward_ae(params, cfg, k_fwd, bits, noise,
                                       self.perms, training=False)
                t = jnp.round(bits.reshape(bits.shape[0], -1))
                p = jnp.round(out.astype(jnp.float32).reshape(out.shape[0], -1))
                err = jnp.not_equal(t, p)
                pos = jnp.sum(err, axis=0).astype(jnp.int32)
                bit_e = bit_e + jnp.sum(pos)
                blk_e = blk_e + jnp.sum(jnp.any(err, axis=1)).astype(jnp.int32)
                pos_e = pos_e + pos
                return (key, bit_e, blk_e, pos_e), None

            init = (key, jnp.int32(0), jnp.int32(0),
                    jnp.zeros(cfg.block_len * cfg.code_rate_k, jnp.int32))
            (key, bit_e, blk_e, pos_e), _ = jax.lax.scan(
                body, init, None, length=chunk)
            return key, bit_e, blk_e, pos_e

        # keyed by (chunk, cfg): chunk_fn closes over self.cfg at build time,
        # and callers (train scripts) mutate trainer.cfg between sweeps —
        # a chunk-only key would silently reuse stale channel/shape semantics
        cache_key = (chunk, cfg)
        if cache_key not in self._sweep_chunks:
            self._sweep_chunks[cache_key] = jax.jit(chunk_fn)
        return self._sweep_chunks[cache_key]

    def sweep(self, snrs, num_block: int = None, chunk: int = 50,
              verbose: bool = True):
        """Fast SNR sweep with exact error counts.

        Returns a dict with per-point bit/block error counts and totals.
        Semantics match test()'s main pass (fixed post-2022 noise: fresh noise
        every batch at sigma = snr_db2sigma(snr); raw probability for
        bec/bsc/ge), minus the punctured second pass (use test() for that —
        reference trainer.py:194-213). cfg.legacy_noise instead reuses ONE
        noise realization across all batches and SNR points (scaled per
        point), reproducing the pre-2022 reference test bug (README.md:2).
        """
        cfg = self.cfg
        num_block = num_block or cfg.num_block
        num_batches = max(1, num_block // cfg.batch_size)
        fixed_unit = None
        if cfg.legacy_noise:
            _check_legacy_noise_channel(cfg.channel)
            from ..channels.noise import sample_noise, spec_from_cfg
            self.key, kn = jax.random.split(self.key)
            fixed_unit = sample_noise(
                kn, (cfg.batch_size, cfg.block_len, cfg.code_rate_n),
                spec_from_cfg(cfg), 1.0)
        res = {'snr': list(snrs), 'ber': [], 'bler': [], 'bit_errors': [],
               'blk_errors': [], 'pos_errors': [],
               'n_bits': num_batches * cfg.batch_size * cfg.block_len
               * cfg.code_rate_k,
               'n_blocks': num_batches * cfg.batch_size}
        for snr in snrs:
            sigma = snr if cfg.channel in ('bec', 'bsc', 'ge') \
                else M.snr_db2sigma(snr)
            bit_e = blk_e = 0
            pos_e = np.zeros(cfg.block_len * cfg.code_rate_k, np.int64)
            left = num_batches
            # one key per point; the chunk program returns its final scan
            # carry key, so the totals are invariant to how the batches are
            # partitioned into chunks (regression-tested)
            self.key, k = jax.random.split(self.key)
            while left > 0:
                n = min(left, chunk)
                step = self._sweep_chunk(n)
                if fixed_unit is None:
                    k, be, ke, pe = step(self.params, k, jnp.float32(sigma))
                else:
                    k, be, ke, pe = step(self.params, k, jnp.float32(sigma),
                                         fixed_unit)
                bit_e += int(be); blk_e += int(ke)
                pos_e += np.asarray(pe, np.int64)
                left -= n
            ber = bit_e / res['n_bits']
            bler = blk_e / res['n_blocks']
            res['ber'].append(ber); res['bler'].append(bler)
            res['bit_errors'].append(bit_e); res['blk_errors'].append(blk_e)
            res['pos_errors'].append(pos_e.tolist())
            if verbose:
                print(f'Test SNR {snr} with ber {ber:.6e} ({bit_e} bit errs) '
                      f'with bler {bler:.6e} ({blk_e} blk errs)', flush=True)
        return res

    def precompute_norm_stats(self):
        """Run the encoder over random bits accumulating running mean/std
        (reference trainer.py:146-153). Stored in self.norm_stats."""
        from ..ops.power import init_norm_stats
        from ..models.encoders import make_encoder
        cfg = self.cfg
        _, enc_apply = make_encoder(cfg)

        @jax.jit
        def enc_pass(params, key, stats):
            bits = _sample_bits(key, (cfg.batch_size, cfg.block_len,
                                      cfg.code_rate_k))
            _, stats = enc_apply(params['enc'], cfg, bits, self.perms,
                                 training=False, stats=stats)
            return stats

        stats = init_norm_stats()
        n = max(1, int(cfg.num_block / cfg.batch_size * cfg.test_ratio))
        for _ in range(n):
            self.key, k = jax.random.split(self.key)
            stats = enc_pass(self.params, k, stats)
        self.norm_stats = stats
        print('Pre-computed norm statistics mean ', float(stats.mean),
              'std ', float(stats.std))
        return stats

    def encoder_power(self, num_batches: int):
        """Mean std of encoder output (reference trainer.py:238-248)."""
        from ..models.encoders import make_encoder
        cfg = self.cfg
        _, enc_apply = make_encoder(cfg)

        @jax.jit
        def enc_std(params, key):
            bits = _sample_bits(key, (cfg.batch_size, cfg.block_len,
                                      cfg.code_rate_k))
            codes, _ = enc_apply(params['enc'], cfg, bits, self.perms,
                                 training=False)
            m = jnp.mean(codes)
            return jnp.sqrt(jnp.sum((codes - m) ** 2) / (codes.size - 1))

        total = 0.0
        for _ in range(num_batches):
            self.key, k = jax.random.split(self.key)
            total += float(enc_std(self.params, k))
        return total / num_batches

    def test(self, verbose: bool = True):
        """SNR sweep -> (snrs, ber, bler) (reference trainer.py:135-248).

        Implements the FIXED post-2022 noise semantics: fresh noise per batch at
        sigma = snr_db2sigma(snr). For bec/bsc/ge channels sigma is the raw
        test probability, matching generate_noise's test path (channels.py:28-31).
        Includes the punctured second pass (top num_ber_puncture worst
        positions zeroed) and positional BER / code power reporting.

        cfg.legacy_noise reproduces the PRE-2022 reference test bug
        (/root/reference/README.md:2: performance was "measured on fixed
        noise rather than random noise", worth >=0.5 dB per that README): one
        unit-sigma noise realization is drawn at sweep start and reused for
        EVERY batch at every SNR point (scaled by the point's sigma); only
        the bits resample. sigma conversion is unchanged — the bug was noise
        reuse, not a dB/sigma mixup.
        """
        import numpy as np
        cfg = self.cfg
        # running-average norm stats: seeded by the precompute pass, then kept
        # accumulating through the sweep (reference encoders.py:110-114)
        stats = self.precompute_norm_stats() if cfg.precompute_norm_stats \
            else None
        num_batches = max(1, cfg.num_block // cfg.batch_size)
        interval = (cfg.snr_test_end - cfg.snr_test_start) \
            / max(1, cfg.snr_points - 1)
        snrs = [cfg.snr_test_start + interval * i for i in range(cfg.snr_points)]
        if verbose:
            print('SNRS', snrs)
        fixed_unit = None
        if cfg.legacy_noise:
            _check_legacy_noise_channel(cfg.channel)
            from ..channels.noise import sample_noise, spec_from_cfg
            self.key, kn = jax.random.split(self.key)
            fixed_unit = sample_noise(
                kn, (cfg.batch_size, cfg.block_len, cfg.code_rate_n),
                spec_from_cfg(cfg), 1.0)
        ber_res, bler_res = [], []
        ber_res_punc, bler_res_punc = [], []
        for snr in snrs:
            if cfg.channel in ('bec', 'bsc', 'ge'):
                sigma = snr
            else:
                sigma = M.snr_db2sigma(snr)
            acc = []
            for _ in range(num_batches):
                self.key, k = jax.random.split(self.key)
                if fixed_unit is not None:
                    a, stats = self._eval_fix(self.params, k,
                                              jnp.float32(sigma) * fixed_unit,
                                              stats)
                else:
                    a, stats = self._eval(self.params, k, jnp.float32(sigma),
                                          stats)
                acc.append(a)
            tb = float(jnp.mean(jnp.stack([a[0] for a in acc])))
            tbl = float(jnp.mean(jnp.stack([a[1] for a in acc])))
            pos_ber = sum(a[2] for a in acc)
            pw = sum(a[3] for a in acc)
            pos_ber = np.asarray(pos_ber) / num_batches
            if cfg.print_pos_power and verbose:
                print('code power', np.asarray(pw) / num_batches)
            res_pos_arg = pos_ber.argsort()[::-1].tolist()
            if cfg.print_pos_ber and verbose:
                print('positional ber', pos_ber)
                print('positional argmax', res_pos_arg)

            # punctured second pass (reference trainer.py:194-213)
            punc_mask = np.ones(cfg.block_len, np.float32)
            punc_mask[res_pos_arg[:cfg.num_ber_puncture]] = 0.0
            accp = []
            for _ in range(num_batches):
                self.key, k = jax.random.split(self.key)
                ap, stats = self._evalp(
                    self.params, k, jnp.float32(sigma),
                    jnp.asarray(punc_mask), stats)
                accp.append(ap)
            tbp = float(jnp.mean(jnp.stack([a[0] for a in accp])))
            tblp = float(jnp.mean(jnp.stack([a[1] for a in accp])))

            if verbose:
                print('Test SNR', snr, 'with ber ', tb, 'with bler', tbl)
                print('Punctured Test SNR', snr, 'with ber ', tbp,
                      'with bler', tblp)
            ber_res.append(tb); bler_res.append(tbl)
            ber_res_punc.append(tbp); bler_res_punc.append(tblp)
        if verbose:
            print('final results on SNRs ', snrs)
            print('BER', ber_res)
            print('BLER', bler_res)
            print('final results on punctured SNRs ', snrs)
            print('BER', ber_res_punc)
            print('BLER', bler_res_punc)
            enc_power = self.encoder_power(num_batches)
            print('encoder power is', enc_power)
            adj_snrs = [M.snr_sigma2db(M.snr_db2sigma(s) / enc_power)
                        for s in snrs]
            print('adjusted SNR should be', adj_snrs)
        return snrs, ber_res, bler_res
