"""Channel sampler statistics and semantics (reference channels.py:7-115)."""
import jax
import jax.numpy as jnp
import numpy as np

from turboae_tpu.config import Config
from turboae_tpu.channels.noise import (NoiseSpec, generate_noise, sample_noise,
                                        train_sigma)
from turboae_tpu.channels.apply import apply_channel
from turboae_tpu.utils.metrics import snr_db2sigma

KEY = jax.random.PRNGKey(0)
SHAPE = (200, 50, 3)


def test_awgn_sigma():
    n = sample_noise(KEY, SHAPE, NoiseSpec('awgn'), 0.5)
    assert abs(float(jnp.std(n)) - 0.5) < 0.01


def test_train_sigma_mixture_range():
    s = train_sigma(KEY, SHAPE, snr_low=-1.5, snr_high=2.0)
    lo, hi = snr_db2sigma(2.0), snr_db2sigma(-1.5)
    arr = np.asarray(s)
    assert arr.min() >= lo - 1e-6 and arr.max() <= hi + 1e-6


def test_t_dist_variance_normalized():
    # sqrt((v-2)/v)*t_v has unit variance (channels.py:38)
    n = sample_noise(KEY, (500, 100, 3), NoiseSpec('t-dist', vv=5.0), 1.0)
    assert abs(float(jnp.std(n)) - 1.0) < 0.05


def test_radar_burst_rate():
    spec = NoiseSpec('radar', radar_prob=0.05, radar_power=10.0)
    n = sample_noise(KEY, (500, 100, 3), spec, 0.1)
    frac_large = float(jnp.mean(jnp.abs(n) > 1.0))
    assert 0.02 < frac_large < 0.08  # ~5% bursts


def test_bsc_mask_prob():
    n = sample_noise(KEY, SHAPE, NoiseSpec('bsc'), 0.1)
    assert set(np.unique(np.asarray(n))) <= {0.0, 1.0}
    assert abs(float(jnp.mean(n)) - 0.9) < 0.01


def test_ge_awgn_two_sigma_states():
    cfg = Config(channel='ge_awgn')
    n = generate_noise(KEY, (100, 200, 3), cfg, test_sigma=0.0)
    # overall std should sit between sigma(+1dB) and sigma(-1dB)
    s = float(jnp.std(n))
    assert snr_db2sigma(1.0) < s < snr_db2sigma(-1.0)


def test_ge_discrete_markov_reference_semantics():
    """Reference chain (channels.py:73,79): from good, P(stay good)=p_gg=0.8;
    from bad, P(return to good)=p_bb=0.8 (the reference's 'stay' comments are
    wrong — the executable code transitions to good from both states with the
    same formula). Stationary P(good) = 0.8."""
    n = sample_noise(KEY, (200, 500, 1), NoiseSpec('ge'), 0.0)
    # bad state (keep prob sigma=0) erases; stationary good fraction = 0.8
    keep = float(jnp.mean(n))
    assert 0.77 < keep < 0.83
    # P(state_t == state_{t+1}) = 0.8*0.8 + 0.2*0.2 = 0.68
    arr = np.asarray(n)[:, :, 0]
    agree = np.mean(arr[:, :-1] == arr[:, 1:])
    assert 0.64 < agree < 0.72


def test_apply_channel_semantics():
    codes = jnp.ones((2, 4, 3))
    noise = jnp.full((2, 4, 3), 0.25)
    np.testing.assert_allclose(apply_channel(KEY, codes, noise, 'awgn'), 1.25)
    np.testing.assert_allclose(apply_channel(KEY, codes, noise, 'bec'), 0.25)
    np.testing.assert_allclose(apply_channel(KEY, codes, noise, 'bsc'), -0.5)


def test_fading_gain_distribution():
    codes = jnp.ones((500, 100, 3))
    noise = jnp.zeros_like(codes)
    rx = apply_channel(KEY, codes, noise, 'fading')
    # E[h] for Rayleigh/sqrt(pi/2) normalization ~= 1.0
    assert abs(float(jnp.mean(rx)) - 1.0) < 0.02
