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
