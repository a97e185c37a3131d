"""Driver-level divergence handling: feed a scripted diverging loss through
scripts/train_family.py's real epoch loop and assert the driver backs off
(halves lrs, reloads) and ultimately aborts when the backoff budget runs out.

The trainer is faked so the test exercises the DRIVER's control flow
deterministically (the guard's numeric behavior is unit-tested in
test_trainers.py)."""
import importlib.util
import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_train_family():
    spec = importlib.util.spec_from_file_location(
        'train_family_under_test',
        os.path.join(_REPO, 'scripts', 'train_family.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FakeModTrainer:
    """Diverges (loss 8.0) from epoch 3 whenever mod_lr is above a threshold;
    healthy (0.1) otherwise. Mimics the round-2 mod-AE lr-coupling blowup."""

    DIVERGE_ABOVE = 6e-4

    def __init__(self, cfg, mesh=None):
        self.cfg = cfg
        self.params = {'mod': 0.0}
        self.opt_state = {'mod': None}

    def train_epoch(self, epoch, phase='decoder', verbose=True):
        if self.cfg.mod_lr > self.DIVERGE_ABOVE and epoch >= 3:
            return 8.0
        return 0.1

    def test(self, verbose=True):
        return [0.0], [0.1], [0.5]


@pytest.fixture()
def driver_env(monkeypatch, tmp_path):
    import turboae_tpu.train.mod_trainer as mt
    import turboae_tpu.train.checkpoint as ck
    saved = {}
    monkeypatch.setattr(mt, 'ModTrainer', _FakeModTrainer)
    monkeypatch.setattr(
        ck, 'save_checkpoint',
        lambda path, params, opt_state=None, step=0:
            saved.__setitem__(path, step))
    monkeypatch.setattr(
        ck, 'load_checkpoint',
        lambda path, params, opt_state=None: params)
    return saved, tmp_path


def _run(argv, tmp_path):
    mod = _load_train_family()
    metrics = tmp_path / 'm.jsonl'
    full = ['--family', 'mod', '--metrics', str(metrics),
            '--ckpt', str(tmp_path / 'm.msgpack'),
            '--num_block', '100', '--batch_size', '50', '--block_len', '8',
            '--val_every', '0', '--test_num_block', '100'] + argv
    old = sys.argv
    sys.argv = ['train_family.py'] + full
    try:
        mod.main()
    finally:
        sys.argv = old
    return [json.loads(l) for l in metrics.read_text().splitlines()]


def test_driver_backs_off_then_recovers(driver_env):
    saved, tmp_path = driver_env
    # mod_lr 1e-3 diverges; one halving lands at 5e-4 < threshold -> recovers
    events = _run(['--epochs', '6', '--mod_lr', '0.001', '--max_backoffs',
                   '2'], tmp_path)
    div = [e for e in events if e['event'] == 'diverged']
    assert len(div) == 1 and div[0]['action'] == 'backoff'
    assert div[0]['lrs']['mod'] == pytest.approx(5e-4)
    # after the backoff the run completes all 6 epochs healthily
    epochs = [e['epoch'] for e in events if e['event'] == 'epoch']
    assert epochs.count(6) == 1
    assert any(e['event'] == 'test' for e in events)


def test_driver_aborts_when_backoffs_exhausted(driver_env, monkeypatch):
    saved, tmp_path = driver_env
    monkeypatch.setattr(_FakeModTrainer, 'DIVERGE_ABOVE', 0.0)  # always bad
    events = _run(['--epochs', '6', '--mod_lr', '0.001', '--max_backoffs',
                   '1'], tmp_path)
    div = [e for e in events if e['event'] == 'diverged']
    assert [d['action'] for d in div] == ['backoff', 'abort']
    # aborted: never reached epoch 6
    epochs = [e['epoch'] for e in events if e['event'] == 'epoch']
    assert 6 not in epochs


def test_average_checkpoints_identity_and_midpoint(tmp_path):
    """Soup of [ckpt, ckpt] == ckpt; weighted soup is the affine midpoint."""
    import subprocess, sys, os
    import numpy as np
    from turboae_tpu.train.checkpoint import save_checkpoint, load_checkpoint
    a = {'enc': {'w': np.full((3,), 1.0, np.float32)},
         'dec': {'w': np.full((3,), 3.0, np.float32)}}
    b = {'enc': {'w': np.full((3,), 2.0, np.float32)},
         'dec': {'w': np.full((3,), 5.0, np.float32)}}
    pa, pb = str(tmp_path / 'a.msgpack'), str(tmp_path / 'b.msgpack')
    save_checkpoint(pa, a); save_checkpoint(pb, b)
    out = str(tmp_path / 'soup.msgpack')
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable,
                        os.path.join(root, 'scripts/average_checkpoints.py'),
                        pa, pb, '--weights', '0.25', '0.75', '--out', out],
                       capture_output=True, text=True, timeout=300,
                       env={**os.environ, 'JAX_PLATFORMS': 'cpu'})
    assert r.returncode == 0, r.stdout + r.stderr
    got = load_checkpoint(out, a)
    np.testing.assert_allclose(got['enc']['w'], 1.75, rtol=1e-6)
    np.testing.assert_allclose(got['dec']['w'], 4.5, rtol=1e-6)


def test_gen_results_tables_roundtrip(tmp_path):
    """regenerate() fills marked blocks from artifacts and is idempotent;
    a generator whose artifact is missing leaves its block untouched."""
    import importlib.util as iu, os, sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = iu.spec_from_file_location(
        'grt', os.path.join(root, 'scripts/gen_results_tables.py'))
    grt = iu.module_from_spec(spec)
    spec.loader.exec_module(grt)
    text = ('header\n<!-- gen:crown -->\n<!-- /gen:crown -->\n'
            'tail\n<!-- gen:nosuch -->\nkeep me\n<!-- /gen:nosuch -->\n')
    out = grt.regenerate(text)
    assert 'ours BER' in out            # crown filled from committed artifact
    assert 'keep me' in out             # unknown generator untouched
    assert grt.regenerate(out) == out   # idempotent


def test_wilson_ci_matches_counts():
    import importlib.util as iu, os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = iu.spec_from_file_location(
        'ef', os.path.join(root, 'scripts/eval_flagship.py'))
    ef = iu.module_from_spec(spec)
    spec.loader.exec_module(ef)
    lo, hi = ef.wilson_ci(0, 1000)
    assert lo == 0.0 and hi < 0.005
    lo, hi = ef.wilson_ci(100, 1000)
    assert lo < 0.1 < hi and hi - lo < 0.05
