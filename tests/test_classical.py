"""Classical oracle layer: golden trellis tables, round-trip encode/decode,
numpy-vs-JAX cross-validation, MT19937 interleaver contract."""
import jax.numpy as jnp
import numpy as np
import pytest

from turboae_tpu.classical.trellis import Trellis, turbo757_trellis, turbo_lte_trellis
from turboae_tpu.classical.convcode import (conv_encode, conv_encode_batch,
                                            viterbi_decode, make_jax_encoder,
                                            make_jax_viterbi)
from turboae_tpu.classical.interleavers import RandInterlv
from turboae_tpu.classical.bcjr import map_decode, make_jax_map_decoder
from turboae_tpu.classical.turbo import (turbo_encode, turbo_encode_batch,
                                         turbo_decode, hazzys_turbo_decode,
                                         make_jax_turbo_decoder)


def test_golden_trellis_tables():
    """Golden fixtures from reference tests/test_convcode.py:14-43."""
    t1 = Trellis(np.array([2]), np.array([[0o5, 0o7]]), 0, 'default')
    np.testing.assert_array_equal(t1.next_state_table,
                                  [[0, 2], [0, 2], [1, 3], [1, 3]])
    np.testing.assert_array_equal(t1.output_table,
                                  [[0, 3], [3, 0], [1, 2], [2, 1]])

    t2 = Trellis(np.array([2]), np.array([[0o1, 0o7]]), 0o5, 'rsc')
    np.testing.assert_array_equal(t2.next_state_table,
                                  [[0, 2], [2, 0], [1, 3], [3, 1]])
    np.testing.assert_array_equal(t2.output_table,
                                  [[0, 3], [0, 3], [1, 2], [1, 2]])


def test_conv_roundtrip_hard_and_soft():
    """Property test from reference tests/test_convcode.py:64-87."""
    t1 = Trellis(np.array([2]), np.array([[0o5, 0o7]]))
    t2 = Trellis(np.array([2]), np.array([[0o1, 0o7]]), 0o5, 'rsc')
    rng = np.random.RandomState(0)
    for trellis in (t1, t2):
        msg = rng.randint(0, 2, 200)
        coded = conv_encode(msg, trellis)
        dec = viterbi_decode(coded.astype(float), trellis, decoding_type='hard')
        np.testing.assert_array_equal(dec[:len(msg)], msg)
        dec = viterbi_decode(2.0 * coded - 1, trellis, decoding_type='unquantized')
        np.testing.assert_array_equal(dec[:len(msg)], msg)


def test_batch_encoder_matches_scalar():
    rng = np.random.RandomState(1)
    msgs = rng.randint(0, 2, (6, 40))
    for trellis, ct in ((Trellis(np.array([2]), np.array([[0o5, 0o7]])), 'default'),
                        (turbo757_trellis(), 'rsc'),
                        (turbo_lte_trellis(), 'rsc')):
        batch = conv_encode_batch(msgs, trellis, ct)
        for i in range(len(msgs)):
            np.testing.assert_array_equal(batch[i], conv_encode(msgs[i], trellis, ct))


def test_jax_encoder_matches_numpy():
    rng = np.random.RandomState(2)
    msgs = rng.randint(0, 2, (4, 30))
    for trellis, ct in ((Trellis(np.array([2]), np.array([[0o5, 0o7]])), 'default'),
                        (turbo757_trellis(), 'rsc')):
        enc = make_jax_encoder(trellis, ct)
        np.testing.assert_array_equal(np.asarray(enc(jnp.asarray(msgs))),
                                      conv_encode_batch(msgs, trellis, ct))


def test_jax_viterbi_roundtrip():
    t1 = Trellis(np.array([2]), np.array([[0o5, 0o7]]))
    rng = np.random.RandomState(3)
    msgs = rng.randint(0, 2, (4, 60))
    codes = conv_encode_batch(msgs, t1).reshape(4, -1, 2)
    vit = make_jax_viterbi(t1, 'unquantized')
    dec = np.asarray(vit(jnp.asarray(2.0 * codes - 1.0, dtype=jnp.float32)))
    np.testing.assert_array_equal(dec[:, :60], msgs)


def test_randinterlv_mt19937_contract():
    r = RandInterlv(100, 0)
    ref = np.random.RandomState(0).permutation(np.arange(100))
    np.testing.assert_array_equal(r.p_array, ref)
    x = np.arange(100)
    np.testing.assert_array_equal(r.deinterlv(r.interlv(x)), x)


def test_turbo_encode_batch_matches_scalar():
    t = turbo757_trellis()
    L = 40
    inter = RandInterlv(L, 0)
    rng = np.random.RandomState(4)
    msgs = rng.randint(0, 2, (4, L))
    batch = turbo_encode_batch(msgs, t, inter.p_array)
    for i in range(4):
        s, p1, p2 = turbo_encode(msgs[i], t, t, inter)
        np.testing.assert_array_equal(batch[i, :, 0], s)
        np.testing.assert_array_equal(batch[i, :, 1], p1)
        np.testing.assert_array_equal(batch[i, :, 2], p2)


def test_bcjr_jax_matches_numpy_llr():
    t = turbo757_trellis()
    L = 30
    rng = np.random.RandomState(5)
    msgs = rng.randint(0, 2, (3, L))
    codes = turbo_encode_batch(msgs, t, RandInterlv(L, 0).p_array)
    sigma = 0.8
    rx = 2.0 * codes - 1.0 + sigma * rng.randn(3, L, 3)
    lext_np, _ = map_decode(rx[0, :, 0], rx[0, :, 1], t, sigma ** 2,
                            np.zeros(L), 'compute')
    jmap = make_jax_map_decoder(t)
    lext_jax = np.asarray(jmap(jnp.asarray(rx[:, :, 0]), jnp.asarray(rx[:, :, 1]),
                               sigma ** 2, jnp.zeros((3, L))))
    np.testing.assert_allclose(lext_jax[0], lext_np, rtol=1e-3, atol=1e-3)


def test_turbo_decode_roundtrip_and_jax_parity():
    t = turbo757_trellis()
    L = 40
    inter = RandInterlv(L, 0)
    rng = np.random.RandomState(6)
    B = 6
    msgs = rng.randint(0, 2, (B, L))
    codes = turbo_encode_batch(msgs, t, inter.p_array)
    sigma = 10 ** (-1.0 / 20)  # 1 dB
    rx = 2.0 * codes - 1.0 + sigma * rng.randn(B, L, 3)

    dec_np = np.stack([hazzys_turbo_decode(rx[i, :, 0], rx[i, :, 1], rx[i, :, 2],
                                           t, sigma ** 2, 6, inter)
                       for i in range(B)])
    jdec = make_jax_turbo_decoder(t, inter.p_array, 6, 'hazzys')
    dec_jax = np.asarray(jdec(jnp.asarray(rx[:, :, 0]), jnp.asarray(rx[:, :, 1]),
                              jnp.asarray(rx[:, :, 2]), sigma ** 2))
    # decision-level parity between host oracle and TPU decoder
    assert np.mean(dec_np == dec_jax) > 0.995
    # and it actually decodes: BER well below raw channel BER
    assert np.mean(dec_jax != msgs) < 0.02


def test_hazzys_g_turbo_decode_roundtrip_and_jax_parity():
    from turboae_tpu.classical import hazzys_g_turbo_decode
    t = turbo757_trellis()
    L = 40
    inter = RandInterlv(L, 0)
    rng = np.random.RandomState(8)
    B = 6
    msgs = rng.randint(0, 2, (B, L))
    codes = turbo_encode_batch(msgs, t, inter.p_array)
    sigma = 10 ** (-1.0 / 20)  # 1 dB
    rx = 2.0 * codes - 1.0 + sigma * rng.randn(B, L, 3)

    dec_np = np.stack([hazzys_g_turbo_decode(rx[i, :, 0], rx[i, :, 1],
                                             rx[i, :, 2], t, sigma ** 2, 6,
                                             inter)
                       for i in range(B)])
    jdec = make_jax_turbo_decoder(t, inter.p_array, 6, 'hazzys_g')
    dec_jax = np.asarray(jdec(jnp.asarray(rx[:, :, 0]), jnp.asarray(rx[:, :, 1]),
                              jnp.asarray(rx[:, :, 2]), sigma ** 2))
    assert np.mean(dec_np == dec_jax) > 0.995
    # damping shouldn't break decoding: BER well below raw channel BER
    assert np.mean(dec_jax != msgs) < 0.02


def test_standard_turbo_decode_runs():
    t = turbo757_trellis()
    L = 30
    inter = RandInterlv(L, 0)
    rng = np.random.RandomState(7)
    msg = rng.randint(0, 2, L)
    s, p1, p2 = turbo_encode(msg, t, t, inter)
    sigma = 0.5
    dec = turbo_decode(2.0 * s - 1 + sigma * rng.randn(L),
                       2.0 * p1 - 1 + sigma * rng.randn(L),
                       2.0 * p2 - 1 + sigma * rng.randn(L),
                       t, sigma ** 2, 6, inter)
    assert np.sum(dec != msg) <= 1


def test_jax_mc_on_device_monte_carlo():
    """make_jax_turbo_mc fuses bits+encode+noise+decode in one program; its
    BER must be statistically consistent with the host-oracle pipeline at the
    same operating point (cross-engine MC agreement, not bit-exactness —
    the RNGs differ by design)."""
    from turboae_tpu.classical.turbo import make_jax_turbo_mc
    import jax
    t = turbo757_trellis()
    L = 40
    inter = RandInterlv(L, 0)
    step = make_jax_turbo_mc(t, inter.p_array, 6, 'hazzys', batch=512)
    sigma = 10 ** (1.0 / 20)  # -1 dB: errors are plentiful
    be, ble = step(jax.random.PRNGKey(0), sigma)
    ber = float(be) / (512 * L)
    # host-oracle reference at the same point
    rng = np.random.RandomState(3)
    msgs = rng.randint(0, 2, (512, L))
    codes = turbo_encode_batch(msgs, t, inter.p_array)
    rx = 2.0 * codes - 1.0 + sigma * rng.randn(512, L, 3)
    jdec = make_jax_turbo_decoder(t, inter.p_array, 6, 'hazzys')
    dec = np.asarray(jdec(jnp.asarray(rx[:, :, 0]), jnp.asarray(rx[:, :, 1]),
                          jnp.asarray(rx[:, :, 2]), sigma ** 2))
    ber_ref = np.mean(dec != msgs)
    assert 0 < ber < 0.5
    # ~512*40 = 20k bits each; at BER ~2-5e-2 the 3-sigma band is ~ +/-40%
    assert abs(ber - ber_ref) < max(0.5 * ber_ref, 0.01), (ber, ber_ref)
