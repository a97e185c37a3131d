"""Regression tests for bugs found in review (round 1).

Each test pins a specific fixed failure mode; see the commit that added this
file for the inventory.
"""
import numpy as np
import jax
import jax.numpy as jnp

from turboae_tpu.config import Config


def _tiny_cfg(**kw):
    base = dict(num_block=32, batch_size=16, block_len=16, enc_num_unit=8,
                dec_num_unit=8, enc_num_layer=1, dec_num_layer=1,
                num_iteration=2, snr_points=2)
    base.update(kw)
    return Config(**base)


def test_lookahead_trainer_step_with_donation():
    """Lookahead's slow weights must be copies, not aliases, of the params:
    the trainer donates params AND opt_state to the same jitted step, and XLA
    rejects donating one buffer twice."""
    from turboae_tpu.train.trainer import Trainer
    cfg = _tiny_cfg(optimizer='lookahead')
    tr = Trainer(cfg)
    before = jax.tree.leaves(tr.params)[0].copy()
    loss = tr.train_epoch(1, 'decoder', verbose=False)  # would raise pre-fix
    assert np.isfinite(loss)
    after = jax.tree.leaves(tr.params)[0]
    assert not np.allclose(before, after)  # params actually moved


def test_jax_standard_turbo_decoder_matches_host_oracle():
    """variant='standard' must decide from decoder 2's posterior of the FINAL
    iteration (not run an extra hidden iteration)."""
    from turboae_tpu.classical.trellis import turbo757_trellis
    from turboae_tpu.classical.interleavers import RandInterlv
    from turboae_tpu.classical.turbo import (turbo_encode_batch, turbo_decode,
                                             make_jax_turbo_decoder)
    t = turbo757_trellis()
    L, B = 40, 6
    inter = RandInterlv(L, 0)
    rng = np.random.RandomState(11)
    msgs = rng.randint(0, 2, (B, L))
    codes = turbo_encode_batch(msgs, t, inter.p_array)
    sigma = 10 ** (-0.0 / 20)  # 0 dB: noisy enough that iteration count shows
    rx = 2.0 * codes - 1.0 + sigma * rng.randn(B, L, 3)

    dec_np = np.stack([
        turbo_decode(rx[i, :, 0], rx[i, :, 1], rx[i, :, 2], t, sigma ** 2,
                     3, inter)
        for i in range(B)])
    jdec = make_jax_turbo_decoder(t, inter.p_array, 3, 'standard')
    dec_jax = np.asarray(jdec(jnp.asarray(rx[:, :, 0]),
                              jnp.asarray(rx[:, :, 1]),
                              jnp.asarray(rx[:, :, 2]), sigma ** 2))
    assert np.mean(dec_np == dec_jax) > 0.995


def test_checkpoint_tolerates_shorter_saved_lists(tmp_path):
    """strict=False analog: resuming a dec_num_layer=1 checkpoint into a
    dec_num_layer=2 model keeps the template leaves for the missing tail."""
    from turboae_tpu.train.checkpoint import save_checkpoint, load_checkpoint
    from turboae_tpu.models.channel_ae import init_ae
    key = jax.random.PRNGKey(0)
    small = init_ae(key, _tiny_cfg(dec_num_layer=1))
    big_tpl = init_ae(key, _tiny_cfg(dec_num_layer=2))
    path = str(tmp_path / 'ck.msgpack')
    save_checkpoint(path, small)
    merged = load_checkpoint(path, big_tpl)  # KeyError pre-fix
    # merged keeps the big template's structure
    assert (jax.tree.structure(merged) == jax.tree.structure(big_tpl))


def test_precompute_norm_stats_changes_eval_normalization():
    """-precompute_norm_stats must actually be consumed by the eval path
    (reference encoders.py:110-114 normalizes with the running stats)."""
    from turboae_tpu.train.trainer import Trainer
    cfg = _tiny_cfg(precompute_norm_stats=True)
    tr = Trainer(cfg)
    _, stats = tr._eval_step(tr.params, jax.random.PRNGKey(1),
                             jnp.float32(0.8), tr.precompute_norm_stats())
    # the eval batch incremented the running-average count
    assert float(stats.count) == float(tr.norm_stats.count) + 1.0
    snrs, ber, bler = tr.test(verbose=False)
    assert all(np.isfinite(b) for b in ber)


def test_mse_loss_finite_at_saturated_output():
    from turboae_tpu.train.losses import customized_loss
    cfg = Config(loss='mse')
    out = jnp.asarray([[[0.0], [1.0], [0.5]]])  # exact 0/1: -inf logit pre-fix
    tgt = jnp.asarray([[[0.0], [1.0], [1.0]]])
    loss = customized_loss(out, tgt, cfg)
    assert np.isfinite(float(loss))


def test_variable_block_len_schedule_is_seeded():
    """Two trainers with the same cfg.seed must draw identical length
    schedules and interleaver seeds (reproducibility contract)."""
    from turboae_tpu.train.trainer import Trainer
    cfg = _tiny_cfg(is_variable_block_len=True, block_len_low=8,
                    block_len_high=24)
    t1, t2 = Trainer(cfg), Trainer(cfg)
    b = t1._vbl_buckets()
    draws1 = [int(t1._np_rng.choice(b)) for _ in range(10)]
    draws2 = [int(t2._np_rng.choice(b)) for _ in range(10)]
    assert draws1 == draws2


def test_2d_encoder_uses_cfg_img_size():
    """Encoder and decoder halves must agree on the image size (cfg.img_size,
    like the reference's -img_size flag), not isqrt(block_len)."""
    from turboae_tpu.models.encoders import _img
    cfg = _tiny_cfg(block_len=64, img_size=8)
    assert _img(cfg) == 8
    # non-square block_len with explicit img_size: _img must follow the flag
    cfg2 = _tiny_cfg(block_len=60, img_size=6)
    assert _img(cfg2) == 6


def test_windowed_viterbi_traceback():
    """tb_depth must actually constrain the traceback (low-latency llcode
    variant): a generous window matches full traceback; the flag is consumed."""
    from turboae_tpu.classical.trellis import Trellis
    from turboae_tpu.classical.convcode import conv_encode, viterbi_decode
    t = Trellis(np.array([2]), np.array([[7, 5]]))
    rng = np.random.RandomState(3)
    msg = rng.randint(0, 2, 50)
    coded = conv_encode(msg, t)
    rx = 2.0 * coded - 1.0 + 0.4 * rng.randn(len(coded))
    full = viterbi_decode(rx, t, decoding_type='unquantized')
    windowed = viterbi_decode(rx, t, tb_depth=15, decoding_type='unquantized')
    assert np.array_equal(full[:50], windowed[:50])  # 15 >= 5*M: same result
    tight = viterbi_decode(rx, t, tb_depth=2, decoding_type='unquantized')
    assert tight.shape == full.shape  # runs; (quality may degrade)


def test_conv_benchmark_bsc_probability_semantics():
    """-channel bsc sweeps the flip PROBABILITY (not the awgn sigma formula,
    which crashes for snr<0 and flips every bit at snr=0)."""
    from turboae_tpu.cli import conv_benchmark as cb
    snrs, bers, _ = cb.main(['-channel', 'bsc', '-decoding_type', 'hard',
                             '-num_block', '200', '-block_len', '40',
                             '-snr_test_start', '0.05', '-snr_test_end', '0.01',
                             '-snr_points', '2', '-engine', 'numpy'])
    assert bers[0] > bers[1]  # higher flip prob -> worse BER
    assert bers[1] < 0.01     # p=0.01 is very decodable at rate 1/2


def test_conv_benchmark_fair_zeroes_full_tail():
    """-fair must zero all n*M tail symbols at rate 1/3 (n=3), not 2*M."""
    from turboae_tpu.cli import conv_benchmark as cb
    snrs, bers, _ = cb.main(['-enc1', '7', '-enc2', '5', '-enc3', '7',
                             '-fair', '1', '-num_block', '100',
                             '-block_len', '40', '-snr_test_start', '2.0',
                             '-snr_test_end', '2.0', '-snr_points', '1',
                             '-engine', 'numpy'])
    assert bers[0] < 0.05  # still decodes fine with the tail zeroed


def test_cnn_decoder_head_is_unactivated():
    """Reference applies dec_act only in DEC_LargeRNN (decoders.py:103); CNN
    decoder heads are raw Linear — -dec_act tanh must not change CNN output."""
    from turboae_tpu.models.channel_ae import init_ae, make_perms, forward_ae
    cfg_a = _tiny_cfg(dec_act='linear')
    cfg_b = _tiny_cfg(dec_act='tanh')
    key = jax.random.PRNGKey(0)
    params = init_ae(key, cfg_a)
    perms = make_perms(cfg_a)
    bits = jax.random.bernoulli(key, 0.5, (4, cfg_a.block_len, 1)).astype(jnp.float32)
    noise = 0.1 * jax.random.normal(key, (4, cfg_a.block_len, 3))
    out_a, _, _ = forward_ae(params, cfg_a, key, bits, noise, perms, training=False)
    out_b, _, _ = forward_ae(params, cfg_b, key, bits, noise, perms, training=False)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_dense_decoder_keys_off_encoder_name():
    """Reference decoders.py:172-176: DEC_LargeCNN uses plain convs ONLY when
    encoder == 'TurboAE_rate3_cnn'; DeepTurbo (classical encoder) gets the
    DENSE decoder."""
    from turboae_tpu.models.decoders import largecnn_init
    key = jax.random.PRNGKey(0)
    # >=2 conv layers: dense stacks concat features so layer-2 widths differ
    plain = largecnn_init(key, _tiny_cfg(encoder='TurboAE_rate3_cnn',
                                         dec_num_layer=2))
    dense = largecnn_init(key, _tiny_cfg(encoder='Turbo_rate3_757',
                                         dec_num_layer=2))
    # dense stacks concatenate features: layer-2 conv input widths differ
    w_plain = plain['final']['dec1_cnn']
    w_dense = dense['final']['dec1_cnn']
    shapes_p = [x.shape for x in jax.tree.leaves(w_plain)]
    shapes_d = [x.shape for x in jax.tree.leaves(w_dense)]
    assert shapes_p != shapes_d


def test_single_iteration_decoder_builds_and_runs():
    """num_iteration=1 (peel-only): _stack_iters([]) must not crash."""
    from turboae_tpu.train.trainer import Trainer
    cfg = _tiny_cfg(num_iteration=1)
    tr = Trainer(cfg)
    loss = tr.train_epoch(1, 'decoder', verbose=False)
    assert np.isfinite(loss)


def test_symbol_power_normalizes_per_position():
    """mod_pc='symbol_power': reference modulations.py:74-81 whitens each
    symbol POSITION over (batch, I/Q), not each I/Q lane over (batch, time)."""
    from turboae_tpu.models.modulation import mod_init, mod_apply
    cfg = _tiny_cfg(block_len=16, mod_rate=2, mod_pc='symbol_power',
                    mod_num_layer=1, mod_num_unit=4)
    key = jax.random.PRNGKey(2)
    params = mod_init(key, cfg)
    codes = jax.random.normal(key, (64, 16, 3))
    sym = np.asarray(mod_apply(params, cfg, codes))
    # per-position std over (batch, I/Q) ~ 1 (Bessel), per-position mean ~ 0
    m = sym.mean(axis=(0, 2))
    s = sym.std(axis=(0, 2), ddof=1)
    assert np.abs(m).max() < 1e-5
    np.testing.assert_allclose(s, 1.0, atol=1e-4)


def test_ftae_ignore_prev_code_zeroes_codes_output():
    from turboae_tpu.models.ftae import init_ftae, forward_ftae
    from turboae_tpu.models.channel_ae import make_perms
    cfg = _tiny_cfg(ignore_prev_code=True, dec_type='cnn')
    key = jax.random.PRNGKey(3)
    params = init_ftae(key, cfg)
    perms = make_perms(cfg)
    bits = jax.random.bernoulli(key, 0.5, (4, cfg.block_len, 1)).astype(jnp.float32)
    fwd_noise = 0.1 * jax.random.normal(key, (4, cfg.block_len, 3))
    fb_noise = 0.1 * jax.random.normal(key, (4, cfg.block_len, 3))
    _, codes = forward_ftae(params, cfg, bits, fwd_noise, fb_noise, perms)
    codes = np.asarray(codes)
    assert np.all(codes[:, :, 0] == 0.0) and np.all(codes[:, :, 1] == 0.0)
    assert np.any(codes[:, :, 2] != 0.0)


def test_rnn_interlayer_dropout_active_in_training():
    """torch GRU(dropout=r) drops between stacked layers; our bigru_apply must
    too (training only)."""
    from turboae_tpu.ops.gru import bigru_init, bigru_apply
    key = jax.random.PRNGKey(4)
    layers = bigru_init(key, 3, 8, 2)
    x = jax.random.normal(key, (2, 10, 3))
    eval_out = bigru_apply(layers, x)
    train_out = bigru_apply(layers, x, dropout=0.5, key=key)
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))
    # dropout only between layers: single-layer stack is unaffected
    one = bigru_init(key, 3, 8, 1)
    a = bigru_apply(one, x)
    b = bigru_apply(one, x, dropout=0.5, key=key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ste_trained_encoder_binarizes_at_eval():
    """Reference power_constraint checks train_channel_mode unconditionally
    (encoders.py:117): STE-trained codes stay binary at eval."""
    from turboae_tpu.ops.power import power_constraint
    cfg = _tiny_cfg(train_channel_mode='block_norm_ste')
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 16, 3))
    codes, _ = power_constraint(x, cfg, training=False)
    vals = np.unique(np.round(np.asarray(codes), 5))
    assert set(vals.tolist()) <= {-1.0, 1.0}
