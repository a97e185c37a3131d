"""Model zoo: shapes, forward sanity, scan-vs-unrolled equivalence, and a
small end-to-end training smoke (loss decreases) for the flagship."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turboae_tpu.config import Config
from turboae_tpu.models.channel_ae import forward_ae, init_ae, make_perms
from turboae_tpu.models.encoders import make_encoder
from turboae_tpu.models.decoders import make_decoder

SMALL = dict(batch_size=4, block_len=16, enc_num_unit=8, dec_num_unit=8,
             enc_num_layer=2, dec_num_layer=2, num_iteration=2, num_iter_ft=3)


def _roundtrip(cfg):
    key = jax.random.PRNGKey(0)
    params = init_ae(key, cfg)
    perms = make_perms(cfg)
    bits = jax.random.bernoulli(key, 0.5, (cfg.batch_size, cfg.block_len,
                                           cfg.code_rate_k)).astype(jnp.float32)
    noise = 0.1 * jax.random.normal(key, (cfg.batch_size, cfg.block_len,
                                          cfg.code_rate_n))
    out, codes, _ = forward_ae(params, cfg, key, bits, noise, perms)
    return bits, codes, out


def test_flagship_shapes():
    cfg = Config(**SMALL)
    bits, codes, out = _roundtrip(cfg)
    assert codes.shape == (4, 16, 3)
    assert out.shape == (4, 16, 1)
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)
    # power constraint: zero mean unit (Bessel) std
    arr = np.asarray(codes)
    assert abs(arr.mean()) < 1e-4


@pytest.mark.parametrize('enc,dec,n', [
    ('TurboAE_rate3_cnn', 'TurboAE_rate3_cnn', 3),
    ('TurboAE_rate3_cnn_dense', 'TurboAE_rate3_cnn_dense', 3),
    ('Turboae_rate3_rnn', 'TurboAE_rate3_rnn', 3),
    ('TurboAE_rate3_rnn_sys', 'TurboAE_rate3_cnn', 3),
    ('TurboAE_rate2_cnn', 'TurboAE_rate2_cnn', 2),
    ('TurboAE_rate2_rnn', 'TurboAE_rate2_rnn', 2),
    ('rate3_cnn', 'rate3_cnn', 3),
    ('turboae_2int', 'turboae_2int', 3),
    ('rate3_cnn', 'nbcjr_rate3', 3),
])
def test_model_zoo_forward(enc, dec, n):
    cfg = Config(encoder=enc, decoder=dec, code_rate_n=n, **SMALL)
    bits, codes, out = _roundtrip(cfg)
    assert codes.shape == (4, 16, n)
    assert out.shape == (4, 16, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_model_zoo_2d():
    cfg = Config(encoder='TurboAE_rate3_cnn2d', decoder='TurboAE_rate3_cnn2d',
                 batch_size=2, block_len=16, img_size=4, enc_num_unit=8,
                 dec_num_unit=8, enc_num_layer=2, dec_num_layer=2,
                 num_iteration=2, num_iter_ft=3, enc_kernel_size=3,
                 dec_kernel_size=3)
    bits, codes, out = _roundtrip(cfg)
    assert codes.shape == (2, 16, 3)
    assert out.shape == (2, 16, 1)


def test_decoder_scan_equals_unrolled():
    """The lax.scan over stacked iteration weights must reproduce the
    reference's unrolled Python loop exactly (decoders.py:229-267)."""
    from turboae_tpu.ops import conv1d as cv
    from turboae_tpu.ops.interleave import rand_perm, invert_perm

    cfg = Config(**SMALL)
    key = jax.random.PRNGKey(3)
    dec_init, dec_apply = make_decoder(cfg)
    params = dec_init(key, cfg)
    perms = make_perms(cfg)
    received = jax.random.normal(key, (cfg.batch_size, cfg.block_len, 3))
    out_scan = dec_apply(params, cfg, received, perms)

    # hand-unrolled reference implementation
    p = np.asarray(perms['p1'])
    inv = invert_perm(p)
    r_sys, r_par1, r_par2 = received[:, :, 0:1], received[:, :, 1:2], received[:, :, 2:3]
    r_sys_int = jnp.take(r_sys, jnp.asarray(p), axis=1)
    prior = jnp.zeros((cfg.batch_size, cfg.block_len, cfg.num_iter_ft))

    def get_iter(tree, i):
        return jax.tree.map(lambda x: x[i], tree)

    n_scan = cfg.num_iteration - 1
    for i in range(n_scan):
        w = get_iter(params['scan'], i)
        h = cv.stack_apply(w['dec1_cnn'], jnp.concatenate([r_sys, r_par1, prior], axis=2))
        x_plr = cv.linear_apply(w['dec1_lin'], h) - prior
        x_int = jnp.take(x_plr, jnp.asarray(p), axis=1)
        h = cv.stack_apply(w['dec2_cnn'], jnp.concatenate([r_sys_int, r_par2, x_int], axis=2))
        x_plr2 = cv.linear_apply(w['dec2_lin'], h) - x_int
        prior = jnp.take(x_plr2, jnp.asarray(inv), axis=1)

    fw = params['final']
    h = cv.stack_apply(fw['dec1_cnn'], jnp.concatenate([r_sys, r_par1, prior], axis=2))
    x_plr = cv.linear_apply(fw['dec1_lin'], h) - prior
    x_int = jnp.take(x_plr, jnp.asarray(p), axis=1)
    h = cv.stack_apply(fw['dec2_cnn'], jnp.concatenate([r_sys_int, r_par2, x_int], axis=2))
    logit = cv.linear_apply(fw['dec2_lin'], h)
    out_ref = jax.nn.sigmoid(jnp.take(logit, jnp.asarray(inv), axis=1))

    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)


def test_train_loss_decreases():
    from turboae_tpu.train.trainer import Trainer
    cfg = Config(batch_size=32, block_len=20, num_block=96, enc_num_unit=16,
                 dec_num_unit=16, enc_num_layer=2, dec_num_layer=2,
                 num_iteration=3)
    tr = Trainer(cfg)
    first = tr.train_epoch(0, 'decoder', verbose=False)
    for e in range(3):
        last = tr.train_epoch(e + 1, 'decoder', verbose=False)
    assert last < first


def test_ste_training_mode_runs():
    cfg = Config(train_channel_mode='block_norm_ste', **SMALL)
    bits, codes, out = _roundtrip(cfg)
    assert set(np.unique(np.asarray(codes))) <= {-1.0, 1.0}


def test_ftae_forward_and_grad():
    from turboae_tpu.models.ftae import init_ftae, forward_ftae
    from turboae_tpu.models.channel_ae import make_perms
    import jax
    import jax.numpy as jnp
    cfg = Config(dec_type='turboae_cnn', **SMALL)
    key = jax.random.PRNGKey(0)
    params = init_ftae(key, cfg)
    perms = make_perms(cfg)
    bits = jax.random.bernoulli(key, 0.5, (4, 16, 1)).astype(jnp.float32)
    fwd_noise = 0.5 * jax.random.normal(key, (4, 16, 3))
    fb_noise = 0.1 * jax.random.normal(key, (4, 16, 3))
    out, codes = forward_ftae(params, cfg, bits, fwd_noise, fb_noise, perms)
    assert out.shape == (4, 16, 1)
    assert codes.shape == (4, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))

    def loss(p):
        o, _ = forward_ftae(p, cfg, bits, fwd_noise, fb_noise, perms)
        return jnp.mean((jnp.clip(o, 0.0, 1.0) - bits) ** 2)
    g = jax.grad(loss)(params)
    flat = jax.tree.leaves(g)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)


def test_ftae_decoder_variants():
    from turboae_tpu.models.ftae import init_ftae, forward_ftae
    from turboae_tpu.models.channel_ae import make_perms
    import jax
    import jax.numpy as jnp
    for dec_type in ('cnn', 'turboae_sharedcnn', 'turboae_rnn'):
        cfg = Config(dec_type=dec_type, **SMALL)
        key = jax.random.PRNGKey(1)
        params = init_ftae(key, cfg)
        perms = make_perms(cfg)
        bits = jax.random.bernoulli(key, 0.5, (2, 16, 1)).astype(jnp.float32)
        out, codes = forward_ftae(params, cfg, bits,
                                  0.5 * jax.random.normal(key, (2, 16, 3)),
                                  0.1 * jax.random.normal(key, (2, 16, 3)), perms)
        assert out.shape == (2, 16, 1), dec_type
        assert np.all(np.isfinite(np.asarray(out))), dec_type


def test_deepturbo_encoder_on_device():
    from turboae_tpu.models.channel_ae import make_perms
    from turboae_tpu.models.deepturbo import turbo_enc_apply
    from turboae_tpu.classical.trellis import turbo757_trellis
    from turboae_tpu.classical.turbo import turbo_encode_batch
    import jax, jax.numpy as jnp
    cfg = Config(encoder='Turbo_rate3_757', decoder='TurboAE_rate3_cnn', **SMALL)
    perms = make_perms(cfg)
    key = jax.random.PRNGKey(2)
    bits = jax.random.bernoulli(key, 0.5, (4, 16, 1)).astype(jnp.float32)
    codes, _ = turbo_enc_apply({}, cfg, bits, perms)
    # parity with the host oracle
    ref = turbo_encode_batch(np.asarray(bits[:, :, 0]).astype(int),
                             turbo757_trellis(), np.asarray(perms['p1']))
    np.testing.assert_array_equal(np.asarray(codes), 2.0 * ref - 1.0)


def test_decoder_scan_unroll_equivalence():
    """cfg.scan_unroll is a pure scheduling lever: fully-unrolled scan must
    match the rolled loop bit-for-bit (same program semantics, different XLA
    loop structure)."""
    cfg = Config(**SMALL)
    key = jax.random.PRNGKey(7)
    dec_init, dec_apply = make_decoder(cfg)
    params = dec_init(key, cfg)
    perms = make_perms(cfg)
    received = jax.random.normal(key, (cfg.batch_size, cfg.block_len, 3))
    out_rolled = dec_apply(params, cfg, received, perms)
    cfg_u = cfg.replace(scan_unroll=cfg.num_iteration - 1)
    out_unrolled = dec_apply(params, cfg_u, received, perms)
    np.testing.assert_array_equal(np.asarray(out_rolled),
                                  np.asarray(out_unrolled))


def test_multi_step_training_matches_single_step():
    """cfg.steps_per_call fuses n optimizer steps into one lax.scan dispatch;
    the PRNG chain and updates must match the host-loop path exactly."""
    from turboae_tpu.train.trainer import Trainer
    cfg = Config(batch_size=8, block_len=12, num_block=48, enc_num_unit=8,
                 dec_num_unit=8, enc_num_layer=2, dec_num_layer=2,
                 num_iteration=2, num_iter_ft=3)
    tr_a = Trainer(cfg)
    tr_b = Trainer(cfg.replace(steps_per_call=4))
    la = tr_a.train_epoch(0, 'decoder', verbose=False)
    lb = tr_b.train_epoch(0, 'decoder', verbose=False)
    assert abs(la - lb) < 1e-6, (la, lb)
    leaves_a = jax.tree.leaves(tr_a.params)
    leaves_b = jax.tree.leaves(tr_b.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # remainder path: 48/8 = 6 batches, groups of 4 -> 1 group + 2 singles
    # already covered; also check a non-dividing steps_per_call
    tr_c = Trainer(cfg.replace(steps_per_call=5))
    lc = tr_c.train_epoch(0, 'decoder', verbose=False)
    assert abs(la - lc) < 1e-6, (la, lc)


def test_ftae_power_alloc_ones_matches_none():
    """pw init is ones, so a fresh 'pos'/'pos_phase' model must produce the
    SAME forward outputs as 'none' — the property that makes warm-starting
    from a uniform-power checkpoint behavior-preserving."""
    from turboae_tpu.models.ftae import init_ftae, forward_ftae
    key = jax.random.PRNGKey(3)
    bits = jax.random.bernoulli(key, 0.5, (4, 16, 1)).astype(jnp.float32)
    fwd = 0.5 * jax.random.normal(key, (4, 16, 3))
    fb = 0.1 * jax.random.normal(key, (4, 16, 3))
    outs = {}
    for alloc in ('none', 'pos', 'pos_phase'):
        cfg = Config(dec_type='turboae_cnn', ftae_power_alloc=alloc, **SMALL)
        params = init_ftae(jax.random.PRNGKey(7), cfg)
        perms = make_perms(cfg)
        if alloc != 'none':
            assert params['fwd_enc1']['pw'].shape == (16, 1)
            assert 'pw' not in params['fb_enc1']
        outs[alloc] = np.asarray(forward_ftae(params, cfg, bits, fwd, fb,
                                              perms)[0])
    np.testing.assert_allclose(outs['pos'], outs['none'], rtol=1e-6)
    np.testing.assert_allclose(outs['pos_phase'], outs['none'], rtol=1e-6)


def test_ftae_power_alloc_conserves_power():
    """Random (non-uniform) weights must not change realized code power: the
    allocation renormalizes against the batch's measured per-position power,
    so each phase's power equals the uniform-whitening baseline EXACTLY for
    'pos', and 'pos_phase' scales it by the normalized per-phase scalars
    (joint power conserved, phases deliberately unequal)."""
    from turboae_tpu.models.ftae import init_ftae, forward_ftae
    key = jax.random.PRNGKey(5)
    bits = jax.random.bernoulli(key, 0.5, (512, 16, 1)).astype(jnp.float32)
    fwd = 0.5 * jax.random.normal(key, (512, 16, 3))
    fb = jnp.zeros((512, 16, 3))

    base_cfg = Config(dec_type='cnn', **SMALL).replace(batch_size=512)
    base_params = init_ftae(jax.random.PRNGKey(11), base_cfg)
    _, base_codes = forward_ftae(base_params, base_cfg, bits, fwd, fb,
                                 make_perms(base_cfg))
    base_pow = (np.asarray(base_codes, np.float64) ** 2).mean(axis=(0, 1))

    for alloc in ('pos', 'pos_phase'):
        cfg = base_cfg.replace(ftae_power_alloc=alloc)
        params = init_ftae(jax.random.PRNGKey(11), cfg)
        for i in (1, 2, 3):
            k = jax.random.fold_in(key, i)
            params[f'fwd_enc{i}']['pw'] = (
                1.0 + 0.5 * jax.random.normal(k, (16, 1)))
            if alloc == 'pos_phase':
                params[f'fwd_enc{i}']['ps'] = jnp.float32(0.5 + 0.4 * i)
        perms = make_perms(cfg)
        _, codes = forward_ftae(params, cfg, bits, fwd, fb, perms)
        codes = np.asarray(codes, np.float64)
        phase_pow = (codes ** 2).mean(axis=(0, 1))
        # phases interact through feedback: x1's weighting changes enc2/enc3
        # inputs, but each phase's whitening+renormalized allocation pins its
        # OWN power, so phase 1 matches exactly and later phases to ~1e-5
        if alloc == 'pos':
            np.testing.assert_allclose(phase_pow, base_pow, rtol=1e-4)
        else:
            s = np.array([0.9, 1.3, 1.7])
            s = s / np.sqrt((s ** 2).mean())
            np.testing.assert_allclose(phase_pow, base_pow * s ** 2,
                                       rtol=1e-4)
            assert phase_pow.std() > 0.05


def test_ftae_power_alloc_gradient_flows():
    """The pw leaves sit in the forward-encoder subtrees, so the FTAE
    trainer's encoder phase must produce nonzero gradients for them."""
    from turboae_tpu.models.ftae import init_ftae, forward_ftae
    cfg = Config(dec_type='cnn', ftae_power_alloc='pos_phase', **SMALL)
    key = jax.random.PRNGKey(9)
    params = init_ftae(key, cfg)
    perms = make_perms(cfg)
    bits = jax.random.bernoulli(key, 0.5, (4, 16, 1)).astype(jnp.float32)
    fwd = 0.5 * jax.random.normal(key, (4, 16, 3))
    fb = 0.1 * jax.random.normal(key, (4, 16, 3))

    def loss(p):
        o, _ = forward_ftae(p, cfg, bits, fwd, fb, perms)
        return jnp.mean((jnp.clip(o, 0.0, 1.0) - bits) ** 2)

    g = jax.grad(loss)(params)
    for i in (1, 2, 3):
        assert float(jnp.abs(g[f'fwd_enc{i}']['pw']).max()) > 0, i


def test_ftae_power_alloc_warm_start_merges():
    """load_checkpoint of a uniform-power FTAE checkpoint into a
    power-alloc model merges every conv/linear leaf and leaves pw at ones."""
    import tempfile
    from turboae_tpu.models.ftae import init_ftae
    from turboae_tpu.train.checkpoint import save_checkpoint, load_checkpoint
    cfg0 = Config(dec_type='turboae_cnn', **SMALL)
    cfg1 = cfg0.replace(ftae_power_alloc='pos_phase')
    p0 = init_ftae(jax.random.PRNGKey(1), cfg0)
    p1 = init_ftae(jax.random.PRNGKey(2), cfg1)
    with tempfile.TemporaryDirectory() as d:
        path = f'{d}/ftae.msgpack'
        save_checkpoint(path, p0, None, step=0)
        stats = {}
        merged = load_checkpoint(path, p1, stats=stats)
    assert stats['merged'] > 0
    # every conv/linear leaf of the forward encoders came from the file...
    for a, b in zip(jax.tree.leaves(p0['fwd_enc1']['cnn']),
                    jax.tree.leaves(merged['fwd_enc1']['cnn'])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...while the power-allocation leaves stay at their identity init
    np.testing.assert_allclose(np.asarray(merged['fwd_enc1']['pw']), 1.0)
    np.testing.assert_allclose(np.asarray(merged['fwd_enc1']['ps']), 1.0)
