"""StreamPETR training path: gradient flow, velocity supervision, learning
sanity, DP-mesh execution."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from far3d_tpu.config import TrainConfig
from far3d_tpu.models.streampetr import tiny_petr_config
from far3d_tpu.train.petr_step import (create_petr_train_state,
                                       make_petr_train_step)
from far3d_tpu.utils.synthetic import synthetic_batch


def _petr_batch(cfg, batch=1, seed=0):
    """Reuse the shared synthetic TrainBatch via a Far3D-config shim that
    matches the PETR geometry."""
    from far3d_tpu.config import DataConfig, Far3DConfig
    h, w = cfg.input_hw
    shim = Far3DConfig(
        pc_range=cfg.pc_range, num_classes=cfg.num_classes,
        data=DataConfig(num_cams=cfg.num_cams, input_hw=(h, w),
                        max_gt=8, max_gt_2d=8))
    return synthetic_batch(shim, batch=batch, seed=seed)


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_petr_config()
    tcfg = dataclasses.replace(TrainConfig(), lr=2e-3, warmup_iters=1,
                               use_grid_mask=False, ema_decay=0.0)
    state, tstate = create_petr_train_state(cfg, jax.random.PRNGKey(0),
                                            batch=1, train_cfg=tcfg)
    batch = _petr_batch(cfg, batch=1, seed=3)
    step = jax.jit(make_petr_train_step(cfg, tcfg))
    return cfg, state, tstate, batch, step


def test_petr_train_step_runs_and_updates(setup):
    cfg, state, tstate, batch, step = setup
    new_state, new_tstate, metrics = step(state, tstate, batch,
                                          jax.random.PRNGKey(42))
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)), f'{k} not finite'
    assert np.asarray(metrics['total_loss']) > 0
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params,
        new_state.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    # velocity code is supervised: reg-head grads reach the velocity dims
    # (loss_bbox covers the full 10-dim code incl. vx/vy at weight 0.2)
    assert new_state.step == 1


def test_petr_loss_decreases_when_overfitting(setup):
    cfg, state, tstate, batch, step = setup
    rng = jax.random.PRNGKey(7)
    first = last = None
    for i in range(25):
        state, _, metrics = step(state, tstate, batch, rng)
        v = float(np.asarray(metrics['total_loss']))
        assert np.isfinite(v), f'loss blew up at iter {i}'
        first = v if first is None else first
        last = v
    assert last < first * 0.85, (first, last)


def test_petr_train_step_dp_mesh():
    from far3d_tpu.parallel.mesh import make_mesh, shard_batch
    cfg = tiny_petr_config()
    tcfg = dataclasses.replace(TrainConfig(), use_grid_mask=False,
                               ema_decay=0.0)
    ndev = len(jax.devices())
    assert ndev == 8
    state, tstate = create_petr_train_state(cfg, jax.random.PRNGKey(0),
                                            batch=ndev, train_cfg=tcfg)
    batch = _petr_batch(cfg, batch=ndev, seed=1)
    mesh = make_mesh()
    with jax.set_mesh(mesh):
        batch = shard_batch(mesh, batch)
        tstate = shard_batch(mesh, tstate)
        step = jax.jit(make_petr_train_step(cfg, tcfg))
        _, _, metrics = step(state, tstate, batch, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(metrics['total_loss']))
