"""Direct unit tests for the loss menu (reference loss.py:30-109) and metrics
(reference utils.py:6-76) — golden values computed by hand / by the reference
formulas, independent of the trainers."""
import numpy as np
import jax.numpy as jnp

from turboae_tpu.config import Config
from turboae_tpu.train.losses import customized_loss
from turboae_tpu.utils import metrics as M

RNG = np.random.RandomState(7)
OUT = RNG.uniform(0.05, 0.95, (8, 10, 1)).astype(np.float32)
TGT = RNG.randint(0, 2, (8, 10, 1)).astype(np.float32)


def _bce_elem(o, t):
    return -(t * np.log(o) + (1 - t) * np.log(1 - o))


def _loss(name, out=OUT, tgt=TGT, code=None, **kw):
    cfg = Config(loss=name, **kw)
    return float(customized_loss(jnp.asarray(out), jnp.asarray(tgt), cfg,
                                 code=None if code is None else jnp.asarray(code)))


def test_bce_matches_formula():
    assert abs(_loss('bce') - _bce_elem(OUT, TGT).mean()) < 1e-5


def test_bce_block_is_mean_of_per_block_max():
    # reference loss.py:70-74: max over dim=1 (time), then mean
    expect = _bce_elem(OUT, TGT).max(axis=1).mean()
    assert abs(_loss('bce_block') - expect) < 1e-5


def test_focal_matches_formula():
    bce = _bce_elem(OUT, TGT)
    pt = np.exp(-bce)
    expect = (0.25 * (1 - pt) ** 2.0 * bce).mean()
    got = _loss('focal', focal_alpha=0.25, focal_gamma=2.0)
    assert abs(got - expect) < 1e-5


def test_maxBCE_adds_worst_position_penalty():
    # reference loss.py:86-96: mean BCE + lambda * max over positions of the
    # batch-mean positional loss
    bce = _bce_elem(OUT, TGT)
    pos = bce.mean(axis=0)          # (L, 1)
    expect = bce.mean() + 0.5 * pos.max(axis=0).mean()
    assert abs(_loss('maxBCE', lambda_maxBCE=0.5) - expect) < 1e-5


def test_sortBCE_top5_positions():
    # intended top-5 positional penalty (the reference's dim=-1 sort is a
    # no-op for k=1 and silently takes the FIRST five positions,
    # loss.py:98-107 — see PARITY.md known deltas)
    bce = _bce_elem(OUT, TGT)
    pos = bce.mean(axis=0).reshape(-1)
    expect = bce.mean() + 0.5 * np.sort(pos)[::-1][:5].sum()
    assert abs(_loss('sortBCE', lambda_maxBCE=0.5) - expect) < 1e-5


def test_soft_ber_perfect_prediction_is_zero():
    out = np.where(TGT > 0.5, 1.0 - 1e-6, 1e-6).astype(np.float32)
    assert _loss('soft_ber', out=out) < 1e-4
    # soft-BER of a coin-flip predictor is ~0.5
    half = np.full_like(OUT, 0.5)
    assert abs(_loss('soft_ber', out=half) - 0.5) < 1e-6


def test_mse_is_on_logits():
    logit = np.log(OUT / (1 - OUT + 1e-7))
    expect = ((logit - TGT) ** 2).mean()
    assert abs(_loss('mse') - expect) < 1e-4


def test_enc_rl_zero_when_no_bit_errors():
    out = np.where(TGT > 0.5, 0.9, 0.1).astype(np.float32)
    code = RNG.randn(8, 10, 3).astype(np.float32)
    assert _loss('enc_rl', out=out, code=code) == 0.0


def test_bce_rl_reduces_to_weighted_mix():
    bce = _bce_elem(OUT, TGT)
    ber = (np.round(OUT) != np.round(TGT)).astype(np.float32)
    centered = ber - ber.mean()
    expect = 2.0 * (centered * bce).mean() + 3.0 * bce.mean()
    got = _loss('bce_rl', ber_lambda=2.0, bce_lambda=3.0)
    assert abs(got - expect) < 1e-5


# ---------------------------------------------------------------- metrics

def test_errors_ber_hand_example():
    t = jnp.asarray([[0.0, 1.0, 1.0, 0.0]])
    p = jnp.asarray([[0.2, 0.8, 0.4, 0.9]])  # rounds to 0,1,0,1 -> 2 errors
    assert abs(float(M.errors_ber(t, p)) - 0.5) < 1e-7


def test_errors_bler_counts_any_error_block():
    t = jnp.zeros((4, 5))
    p = t.at[0, 2].set(1.0).at[3, 4].set(1.0)
    assert abs(float(M.errors_bler(t, p)) - 0.5) < 1e-7


def test_errors_ber_pos_and_list_consistent():
    t = jnp.asarray(TGT[..., 0])
    p = jnp.asarray(OUT[..., 0])
    pos = np.asarray(M.errors_ber_pos(t, p))
    lst = np.asarray(M.errors_ber_list(t, p))
    total = float(M.errors_ber(t, p))
    assert abs(pos.mean() - total) < 1e-6
    assert abs(lst.mean() - total) < 1e-6


def test_punctured_ber_zeroes_masked_positions():
    t = jnp.zeros((2, 4))
    p = jnp.asarray([[1.0, 0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 1.0]])
    mask = jnp.asarray([0.0, 1.0, 1.0, 1.0])  # puncture position 0
    # errors at pos0 (rate 1.0, masked) and pos3 (rate 0.5)
    # reference utils.py:11-17 semantics: mean over ALL positions incl. zeros
    assert abs(float(M.errors_ber_punctured(t, p, mask)) - 0.5 / 4) < 1e-7
    # bler with mask: only block 1 has an unmasked error
    assert abs(float(M.errors_bler(t, p, mask)) - 0.5) < 1e-7


def test_code_power_and_snr_conversions():
    codes = jnp.ones((3, 5, 2)) * 2.0
    pw = np.asarray(M.code_power(codes))
    assert pw.shape == (5,) and np.allclose(pw, 4.0)
    assert abs(M.snr_db2sigma(0.0) - 1.0) < 1e-9
    assert abs(M.snr_sigma2db(M.snr_db2sigma(3.7)) - 3.7) < 1e-9
