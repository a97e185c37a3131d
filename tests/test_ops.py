"""Unit tests for core ops: interleaver exactness vs the MT19937 contract,
STE forward/backward semantics, power constraint, conv/GRU shape + parity
with reference formulas."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turboae_tpu.config import Config
from turboae_tpu.ops import conv1d as cv
from turboae_tpu.ops import gru as rnn
from turboae_tpu.ops.interleave import (rand_perm, invert_perm, interleave,
                                        deinterleave)
from turboae_tpu.ops.power import power_constraint
from turboae_tpu.ops.ste import ste_quantize, rx_quantize


def test_rand_perm_matches_numpy_mt19937():
    # the contract: RandInterlv(length, seed).p_array == RandomState(seed).permutation(arange)
    # (reference commpy/channelcoding/interleavers.py:77-82)
    for seed in (0, 1, 42):
        p = rand_perm(100, seed)
        ref = np.random.RandomState(seed).permutation(np.arange(100))
        np.testing.assert_array_equal(p, ref)


def test_interleave_roundtrip():
    p = rand_perm(50, 0)
    x = jnp.asarray(np.random.randn(4, 50, 3).astype(np.float32))
    y = interleave(x, p)
    # matches the reference's permute(1,0,2)[p] semantics: y[:, i] = x[:, p[i]]
    np.testing.assert_allclose(np.asarray(y)[:, 0], np.asarray(x)[:, p[0]])
    z = deinterleave(y, p)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x))


def test_invert_perm():
    p = rand_perm(64, 3)
    inv = invert_perm(p)
    np.testing.assert_array_equal(p[inv], np.arange(64))


def test_ste_forward_binary():
    x = jnp.asarray([-2.0, -0.3, 0.0, 0.7, 3.0])
    out = ste_quantize(x, 1.0, 2, 0.01, 'both')
    # sign of clamped input (encoders.py:29-32); sign(0)=0 matches torch
    np.testing.assert_allclose(np.asarray(out), [-1.0, -1.0, 0.0, 1.0, 1.0])


def test_ste_forward_multilevel():
    x = jnp.asarray([-1.0, -0.5, 0.0, 0.5, 1.0])
    out = ste_quantize(x, 1.0, 4, 0.01, 'both')
    # 4 levels over [-1,1]: {-1, -1/3, 1/3, 1}; x=0 maps to +1/3 via
    # round-half-to-even (round(1.5)=2), same as torch.round (encoders.py:34)
    np.testing.assert_allclose(np.asarray(out),
                               [-1.0, -1/3, 1/3, 1/3, 1.0], atol=1e-6)


def test_ste_backward_clipping_modes():
    x = jnp.asarray([-2.0, 0.5, 2.0])

    def g(mode):
        f = lambda v: jnp.sum(ste_quantize(v, 1.0, 2, 0.01, mode) * jnp.asarray([1.0, 1.0, 1.0]))
        return np.asarray(jax.grad(f)(x))

    # inputs: zero outside [-1,1], pass-through inside
    np.testing.assert_allclose(g('inputs'), [0.0, 1.0, 0.0])
    # gradient: clamp to +-0.01 everywhere
    np.testing.assert_allclose(g('gradient'), [0.01, 0.01, 0.01])
    # both: zero outside then clamp
    np.testing.assert_allclose(g('both'), [0.0, 0.01, 0.0])
    # none: straight through
    np.testing.assert_allclose(g('none'), [1.0, 1.0, 1.0])


def test_rx_quantize_grad():
    x = jnp.asarray([-2.0, 0.5, 2.0])
    f = lambda v: jnp.sum(rx_quantize(v) * 3.0)
    g = np.asarray(jax.grad(f)(x))
    # input-gated at 1.0, clamp 0.25 (reference ste.py:32-35)
    np.testing.assert_allclose(g, [0.0, 0.25, 0.0])


def test_power_constraint_whitening():
    cfg = Config()
    x = jnp.asarray(np.random.RandomState(0).randn(8, 10, 3).astype(np.float32) * 3 + 1)
    out, _ = power_constraint(x, cfg, training=True)
    arr = np.asarray(out)
    assert abs(arr.mean()) < 1e-5
    # torch.std uses ddof=1 (Bessel)
    assert abs(arr.std(ddof=1) - 1.0) < 1e-5


def test_power_constraint_ste_binarizes():
    cfg = Config(train_channel_mode='block_norm_ste')
    x = jnp.asarray(np.random.RandomState(0).randn(8, 10, 3).astype(np.float32))
    out, _ = power_constraint(x, cfg, training=True)
    assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}


def test_conv1d_same_length_matches_torch():
    # XLA:CPU's default conv precision uses a bf16-ish fast path on this host
    # (~0.4% rel error); force full f32 for torch parity.
    torch = pytest.importorskip('torch')
    np.random.seed(0)
    x = np.random.randn(2, 11, 3).astype(np.float32)
    p = cv.conv1d_init(jax.random.PRNGKey(0), 3, 7, 5)
    with jax.default_matmul_precision('highest'):
        y = cv.conv1d_apply(p, jnp.asarray(x))
    assert y.shape == (2, 11, 7)

    tconv = torch.nn.Conv1d(3, 7, 5, padding=2, bias=True)
    with torch.no_grad():
        # our w: (K, Cin, Cout); torch: (Cout, Cin, K)
        tconv.weight.copy_(torch.from_numpy(np.transpose(np.asarray(p['w']), (2, 1, 0))))
        tconv.bias.copy_(torch.from_numpy(np.asarray(p['b'])))
        ty = tconv(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), ty, atol=1e-5)


def test_gru_matches_torch():
    torch = pytest.importorskip('torch')
    np.random.seed(1)
    x = np.random.randn(2, 9, 4).astype(np.float32)
    params = rnn.bigru_init(jax.random.PRNGKey(1), 4, 6, 1)
    with jax.default_matmul_precision('highest'):
        y = rnn.bigru_apply(params, jnp.asarray(x))
    assert y.shape == (2, 9, 12)

    tg = torch.nn.GRU(4, 6, num_layers=1, batch_first=True, bidirectional=True)
    with torch.no_grad():
        lay = params[0]
        tg.weight_ih_l0.copy_(torch.from_numpy(np.asarray(lay['fwd']['w_ih']).T))
        tg.weight_hh_l0.copy_(torch.from_numpy(np.asarray(lay['fwd']['w_hh']).T))
        tg.bias_ih_l0.copy_(torch.from_numpy(np.asarray(lay['fwd']['b_ih'])))
        tg.bias_hh_l0.copy_(torch.from_numpy(np.asarray(lay['fwd']['b_hh'])))
        tg.weight_ih_l0_reverse.copy_(torch.from_numpy(np.asarray(lay['bwd']['w_ih']).T))
        tg.weight_hh_l0_reverse.copy_(torch.from_numpy(np.asarray(lay['bwd']['w_hh']).T))
        tg.bias_ih_l0_reverse.copy_(torch.from_numpy(np.asarray(lay['bwd']['b_ih'])))
        tg.bias_hh_l0_reverse.copy_(torch.from_numpy(np.asarray(lay['bwd']['b_hh'])))
        ty, _ = tg(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), atol=1e-4)


def test_dense_stack_channels():
    params = cv.dense_stack_init(jax.random.PRNGKey(0), 3, 2, 5, 3)
    # layer i input channels: 2 + i*5 (cnn_utils.py:62)
    assert params[0]['w'].shape == (3, 2, 5)
    assert params[1]['w'].shape == (3, 7, 5)
    assert params[2]['w'].shape == (3, 12, 5)
    x = jnp.ones((2, 8, 2))
    y = cv.dense_stack_apply(params, x)
    assert y.shape == (2, 8, 5)


def test_bce_loss_no_nan_at_saturation():
    """BCE must stay finite (and produce finite grads) when the decoder
    saturates to exactly 0/1 in f32 — the NaN that killed training runs
    before the eps/log clamps."""
    from turboae_tpu.train.losses import customized_loss
    from turboae_tpu.config import Config
    cfg = Config(loss='bce')
    out = jnp.asarray([[[1.0], [0.0], [0.5]]])
    tgt = jnp.asarray([[[0.0], [1.0], [1.0]]])
    loss = customized_loss(out, tgt, cfg)
    assert np.isfinite(float(loss))

    g = jax.grad(lambda o: customized_loss(o, tgt, cfg))(out)
    assert np.all(np.isfinite(np.asarray(g)))
