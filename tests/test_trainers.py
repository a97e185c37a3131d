"""Trainer-level smoke tests for the FTAE and modulation training stacks
(the flagship Trainer is covered in test_models/test_dist)."""
import numpy as np

from turboae_tpu.config import Config

SMALL = dict(batch_size=8, block_len=16, num_block=16, enc_num_unit=8,
             dec_num_unit=8, enc_num_layer=2, dec_num_layer=2,
             num_iteration=2, num_iter_ft=3, snr_points=2)


def test_ftae_trainer_epoch_and_test():
    from turboae_tpu.train.ftae_trainer import FTAETrainer
    tr = FTAETrainer(Config(dec_type='turboae_cnn', **SMALL))
    l1 = tr.train_epoch(0, 'encoder', verbose=False)
    l2 = tr.train_epoch(0, 'decoder', verbose=False)
    assert np.isfinite(l1) and np.isfinite(l2)
    snrs, ber, bler = tr.test(verbose=False)
    assert len(ber) == 2 and all(np.isfinite(b) for b in ber)


def test_mod_trainer_all_phases():
    from turboae_tpu.train.mod_trainer import ModTrainer
    tr = ModTrainer(Config(**SMALL))
    losses = {}
    for phase in ('encoder', 'decoder', 'mod', 'demod'):
        losses[phase] = tr.train_epoch(0, phase, verbose=False)
        assert np.isfinite(losses[phase]), phase
    snrs, ber, bler = tr.test(verbose=False)
    assert len(ber) == 2


def test_mod_trainer_qpsk_and_symbol_power():
    from turboae_tpu.train.mod_trainer import ModTrainer
    for pc in ('qpsk', 'symbol_power'):
        tr = ModTrainer(Config(mod_pc=pc, **SMALL))
        l = tr.train_epoch(0, 'decoder', verbose=False)
        assert np.isfinite(l), pc


def test_variable_block_len_training():
    from turboae_tpu.train.trainer import Trainer
    cfg = Config(is_variable_block_len=True, block_len_low=8,
                 block_len_high=24, **SMALL)
    tr = Trainer(cfg)
    l = tr.train_epoch(0, 'decoder', verbose=False)
    assert np.isfinite(l)


def test_dropout_rnn_training():
    from turboae_tpu.train.trainer import Trainer
    cfg = Config(encoder='Turboae_rate3_rnn', decoder='TurboAE_rate3_rnn',
                 dropout=0.2, **SMALL)
    tr = Trainer(cfg)
    l = tr.train_epoch(0, 'decoder', verbose=False)
    assert np.isfinite(l)


def test_deepturbo_training():
    from turboae_tpu.train.trainer import Trainer
    cfg = Config(encoder='Turbo_rate3_757', decoder='TurboAE_rate3_cnn',
                 **SMALL)
    tr = Trainer(cfg)
    l1 = tr.train_epoch(0, 'decoder', verbose=False)
    l2 = tr.train_epoch(1, 'decoder', verbose=False)
    assert np.isfinite(l1) and np.isfinite(l2)


# ----------------------------------------------------------------------
# Learn-assertions: each secondary family must demonstrably LEARN (loss
# decreases materially and the decoder beats chance), not just produce
# finite numbers. Anchored training curves live in RESULTS.md; these are
# the fast CI regression versions.
# ----------------------------------------------------------------------
LEARN = dict(batch_size=32, block_len=16, num_block=128, enc_num_unit=16,
             dec_num_unit=16, enc_num_layer=2, dec_num_layer=2,
             num_iteration=2, num_iter_ft=3, snr_points=2)


def test_ftae_learns():
    from turboae_tpu.train.ftae_trainer import FTAETrainer
    # easy channel (4 dB fwd, clean-ish feedback) so a tiny model converges
    tr = FTAETrainer(Config(dec_type='turboae_cnn',
                            train_enc_channel_low=4.0,
                            train_enc_channel_high=4.0,
                            train_dec_channel_low=4.0,
                            train_dec_channel_high=4.0, **LEARN))
    first = tr.train_epoch(0, 'decoder', verbose=False)
    for ep in range(1, 8):
        tr.train_epoch(ep, 'encoder', verbose=False)
        last = tr.train_epoch(ep, 'decoder', verbose=False)
    assert last < 0.6 * first, (first, last)
    _, ber, _ = tr.test(verbose=False)
    assert ber[-1] < 0.2, ber  # decoder decodes, not chance (0.5)


def test_mod_trainer_learns():
    from turboae_tpu.train.mod_trainer import ModTrainer
    tr = ModTrainer(Config(train_dec_channel_low=6.0,
                           train_dec_channel_high=6.0,
                           train_enc_channel_low=6.0,
                           train_enc_channel_high=6.0, **LEARN))
    first = tr.train_epoch(0, 'decoder', verbose=False)
    for ep in range(1, 8):
        for phase in ('encoder', 'mod', 'demod'):
            tr.train_epoch(ep, phase, verbose=False)
        last = tr.train_epoch(ep, 'decoder', verbose=False)
    assert last < 0.6 * first, (first, last)
    _, ber, _ = tr.test(verbose=False)
    assert ber[-1] < 0.2, ber


def test_deepturbo_learns():
    from turboae_tpu.train.trainer import Trainer
    cfg = Config(encoder='Turbo_rate3_757', decoder='TurboAE_rate3_cnn',
                 train_dec_channel_low=3.0, train_dec_channel_high=3.0,
                 **LEARN)
    tr = Trainer(cfg)
    first = tr.train_epoch(0, 'decoder', verbose=False)
    for ep in range(1, 10):
        last = tr.train_epoch(ep, 'decoder', verbose=False)
    assert last < 0.6 * first, (first, last)
    _, ber = tr.validate(verbose=False)
    assert ber < 0.2, ber


# ---------------------------------------------------------------------------
# Divergence guard + best-checkpoint retention (round-2 verdict item 6: the
# mod-AE lr-5e-3 explosion at epoch 40 burned chip hours undetected)
# ---------------------------------------------------------------------------

def test_guard_trips_on_nan_and_inf():
    from turboae_tpu.train.guard import DivergenceGuard
    g = DivergenceGuard()
    assert g.check(float('nan'))
    assert g.check({'dec': float('inf'), 'enc': 0.1})


def test_guard_trips_on_explosion_vs_median():
    from turboae_tpu.train.guard import DivergenceGuard
    g = DivergenceGuard(warmup=3)
    for v in (0.69, 0.5, 0.4, 0.35):
        assert not g.check(v)
    # 0.4 median * 3 = 1.2; 8.0 is the mod-AE explosion signature
    assert g.check(8.0)


def test_guard_hard_max_trips_inside_warmup():
    from turboae_tpu.train.guard import DivergenceGuard
    g = DivergenceGuard(warmup=3, hard_max=5.0)
    # first epoch already saturated-BCE garbage: must trip even with no
    # history (the median would otherwise be poisoned)
    assert g.check(16.0)


def test_guard_tolerates_decline_and_late_noise():
    from turboae_tpu.train.guard import DivergenceGuard
    g = DivergenceGuard(warmup=3)
    for v in (0.69, 0.3, 0.1, 0.05, 0.02, 0.01):
        assert not g.check(v)
    # late-training noise: 1e-4-scale wiggle must NOT trip (min_jump floor)
    g2 = DivergenceGuard(warmup=3)
    for v in (2e-4, 1e-4, 1.2e-4, 3e-4, 2.5e-4):
        assert not g2.check(v)


def test_guard_reset_and_backoff_lrs():
    from turboae_tpu.train.guard import DivergenceGuard, backoff_lrs
    g = DivergenceGuard(warmup=1)
    assert not g.check(0.1)
    g.reset()
    assert not g.check(0.4)  # fresh history: no ratio comparison to 0.1
    lrs = backoff_lrs({'enc': 1e-3, 'mod': 5e-3})
    assert lrs == {'enc': 5e-4, 'mod': 2.5e-3}


def test_best_tracker():
    from turboae_tpu.train.guard import BestTracker
    b = BestTracker()
    assert b.update(0.1, 1)
    assert not b.update(0.2, 2)
    assert not b.update(float('nan'), 3)
    assert b.update(0.05, 4)
    assert b.best_epoch == 4


# ---------------------------------------------------------------------------
# Round 4: fast count-based sweep + corrected legacy_noise semantics
# ---------------------------------------------------------------------------

def test_sweep_counts_match_test_metrics():
    """sweep()'s exact error counts must agree with test()'s main-pass
    mean-of-means BER/BLER when run over the same number of blocks (same
    semantics, different accumulation). Statistical agreement: same params,
    same channel, large enough batch that both land near the true BER."""
    from turboae_tpu.train.trainer import Trainer
    cfg = Config(seed=3, **SMALL)
    tr = Trainer(cfg)
    # one high-SNR point: an untrained net gives BER ~0.5, tight variance
    r = tr.sweep([2.0], num_block=16, chunk=2, verbose=False)
    assert r['n_bits'] == 16 * 16 and r['n_blocks'] == 16
    assert r['bit_errors'][0] == int(round(r['ber'][0] * r['n_bits']))
    assert 0.3 < r['ber'][0] < 0.7
    assert sum(r['pos_errors'][0]) == r['bit_errors'][0]
    # chunking must not change the counts: same key path => same totals
    tr2 = Trainer(cfg)
    r2 = tr2.sweep([2.0], num_block=16, chunk=1, verbose=False)
    assert r2['bit_errors'] == r['bit_errors']
    assert r2['blk_errors'] == r['blk_errors']


def test_sweep_bf16_close_to_f32():
    from turboae_tpu.train.trainer import Trainer
    r32 = Trainer(Config(seed=1, **SMALL)).sweep(
        [1.0], num_block=64, verbose=False)
    rbf = Trainer(Config(seed=1, dtype='bfloat16', **SMALL)).sweep(
        [1.0], num_block=64, verbose=False)
    # untrained net, BER ~0.5 both ways; bf16 must not shift the metric
    assert abs(r32['ber'][0] - rbf['ber'][0]) < 0.05


def test_legacy_noise_reuses_fixed_realization():
    """cfg.legacy_noise pins the pre-2022 reference test bug
    (/root/reference/README.md:2): ONE noise realization reused across all
    batches/SNR points (scaled per point), only bits resample."""
    import jax
    import jax.numpy as jnp
    from turboae_tpu.train.trainer import Trainer
    cfg = Config(seed=0, legacy_noise=True, **SMALL)
    tr = Trainer(cfg)
    captured = []
    orig = tr._eval_fix

    def spy(params, key, noise, stats=None):
        captured.append(np.asarray(noise))
        return orig(params, key, noise, stats)

    tr._eval_fix = spy
    tr.cfg = cfg.replace(num_block=2 * cfg.batch_size)  # 2 batches/point
    tr.test(verbose=False)
    assert len(captured) >= 4  # 2 points x 2 batches
    # within a point: identical tensors (reuse), across points: same unit
    # realization scaled by sigma ratio
    np.testing.assert_array_equal(captured[0], captured[1])
    from turboae_tpu.utils.metrics import snr_db2sigma
    interval = (cfg.snr_test_end - cfg.snr_test_start) / (cfg.snr_points - 1)
    s0 = snr_db2sigma(cfg.snr_test_start)
    s1 = snr_db2sigma(cfg.snr_test_start + interval)
    np.testing.assert_allclose(captured[2], captured[0] * (s1 / s0),
                               rtol=1e-5)


def test_legacy_noise_sigma_is_db_converted():
    """Regression for the round-3 misreading: legacy mode must still convert
    SNR dB -> sigma (the bug was noise REUSE, never sigma=snr)."""
    from turboae_tpu.train.trainer import Trainer
    cfg = Config(seed=0, legacy_noise=True, snr_test_start=6.0,
                 snr_test_end=6.0, **{**SMALL, 'snr_points': 1})
    tr = Trainer(cfg)
    seen = []
    orig = tr._eval_fix
    tr._eval_fix = lambda p, k, n, s=None: (seen.append(np.asarray(n)),
                                            orig(p, k, n, s))[1]
    tr.test(verbose=False)
    # at 6 dB, sigma ~ 0.501: std of the scaled awgn tensor must be ~sigma,
    # NOT ~6.0 (the old misreading)
    assert 0.3 < seen[0].std() < 0.7, seen[0].std()


def test_ftae_sweep_counts():
    from turboae_tpu.train.ftae_trainer import FTAETrainer
    tr = FTAETrainer(Config(dec_type='turboae_cnn', **SMALL))
    r = tr.sweep([2.0], num_block=16, chunk=2, verbose=False)
    assert r['n_bits'] == 16 * 16
    assert r['bit_errors'][0] == int(round(r['ber'][0] * r['n_bits']))
    assert 0.0 <= r['ber'][0] <= 1.0
