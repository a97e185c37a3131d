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
