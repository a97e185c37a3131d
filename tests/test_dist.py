"""Sharding: mesh construction, sharded-vs-single-device equivalence — the
dimension the reference never tested (its DataParallel was assumed
transparent; our GSPMD path is verified numerically)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turboae_tpu.config import Config
from turboae_tpu.dist.mesh import make_mesh, data_sharding
from turboae_tpu.train.trainer import Trainer

SMALL = dict(batch_size=16, block_len=16, enc_num_unit=8, dec_num_unit=8,
             enc_num_layer=2, dec_num_layer=2, num_iteration=2, num_iter_ft=3,
             num_block=16)


def test_mesh_construction():
    mesh = make_mesh((8,))
    assert mesh is not None and mesh.size == 8
    assert data_sharding(mesh) is not None
    assert make_mesh(()) is None


def test_sharded_matches_single_device():
    """Identical seeds: the 8-way sharded train step must match the
    single-device step (global power-norm stats via GSPMD collectives)."""
    cfg = Config(**SMALL)
    tr1 = Trainer(cfg)
    tr8 = Trainer(cfg, mesh=make_mesh((8,)))
    l1 = tr1.train_epoch(0, 'decoder', verbose=False)
    l8 = tr8.train_epoch(0, 'decoder', verbose=False)
    assert abs(l1 - l8) < 1e-4, (l1, l8)
    # params after the step agree too
    p1 = jax.tree.leaves(tr1.params)
    p8 = jax.tree.leaves(tr8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_eval_matches():
    cfg = Config(**SMALL)
    tr1 = Trainer(cfg)
    tr8 = Trainer(cfg, mesh=make_mesh((8,)))
    tr8.params = tr1.params
    k = jax.random.PRNGKey(7)
    b1, _ = tr1._eval(tr1.params, k, jnp.float32(0.7))
    b8, _ = tr8._eval(tr8.params, k, jnp.float32(0.7))
    np.testing.assert_allclose(float(b1[0]), float(b8[0]), atol=1e-6)
    np.testing.assert_allclose(float(b1[1]), float(b8[1]), atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from turboae_tpu.train.checkpoint import save_checkpoint, load_checkpoint
    cfg = Config(**SMALL)
    tr = Trainer(cfg)
    tr.train_epoch(0, 'decoder', verbose=False)
    path = str(tmp_path / 'ckpt.msgpack')
    save_checkpoint(path, tr.params, tr.opt_state, step=3)
    tr2 = Trainer(cfg)
    params, opt_state, step = load_checkpoint(path, tr2.params, tr2.opt_state)
    assert step == 3
    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt state restored too (adam mu/nu)
    for a, b in zip(jax.tree.leaves(tr.opt_state), jax.tree.leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lookahead_optimizer_syncs():
    import optax
    from turboae_tpu.train.optimizers import lookahead
    opt = lookahead(optax.sgd(0.1), k=5, alpha=0.5)
    params = {'w': jnp.ones(4)}
    state = opt.init(params)
    g = {'w': jnp.ones(4)}
    # call 0 syncs: fast after inner step = 1 - 0.1 = 0.9;
    # slow = 1 + 0.5*(0.9-1) = 0.95; fast <- slow
    updates, state = opt.update(g, state, params)
    params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params['w']), 0.95, rtol=1e-6)
    # calls 1..4 are plain sgd steps on the fast weights
    for _ in range(4):
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params['w']), 0.95 - 0.4, rtol=1e-5)
    # call 5 syncs again: fast=0.45; slow = 0.95+0.5*(0.45-0.95)=0.7
    updates, state = opt.update(g, state, params)
    params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params['w']), 0.7, rtol=1e-5)


def test_time_sharded_matches_single_device():
    """Sequence-parallel (time-axis) sharding: interleaver all-to-all + conv
    halo exchange via GSPMD must reproduce single-device numerics."""
    cfg = Config(shard_axis='time', **SMALL)
    tr1 = Trainer(Config(**SMALL))
    trt = Trainer(cfg, mesh=make_mesh((8,)))
    l1 = tr1.train_epoch(0, 'decoder', verbose=False)
    lt = trt.train_epoch(0, 'decoder', verbose=False)
    assert abs(l1 - lt) < 1e-4, (l1, lt)


def test_time_sharded_long_block_k1000():
    """The SP payoff case: block_len=1000 (the length the reference concedes
    is memory-hard, docs/howtos.md:66) trains under time-axis sharding on the
    8-device mesh and matches single-device numerics. Small channel counts
    keep the CPU run fast; the sharding pattern (all-to-all interleaver +
    conv halo exchange at L=1000/8 per shard) is the one the TPU run uses."""
    small = dict(SMALL, block_len=1000, batch_size=4, num_block=4)
    cfg = Config(shard_axis='time', **small)
    tr1 = Trainer(Config(**small))
    trt = Trainer(cfg, mesh=make_mesh((8,)))
    l1 = tr1.train_epoch(0, 'decoder', verbose=False)
    lt = trt.train_epoch(0, 'decoder', verbose=False)
    assert abs(l1 - lt) < 1e-4, (l1, lt)
