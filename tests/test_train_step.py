"""Training-step tests: loss finiteness, param updates, DP-mesh sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from far3d_tpu import tiny_test_config
from far3d_tpu.train.step import create_train_state, make_train_step
from far3d_tpu.utils.synthetic import synthetic_batch


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_test_config()
    state, tstate = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    batch = synthetic_batch(cfg, batch=1)
    step = jax.jit(make_train_step(cfg, use_gt_depth=True))
    return cfg, state, tstate, batch, step


def test_train_step_runs(setup):
    cfg, state, tstate, batch, step = setup
    new_state, new_tstate, metrics = step(state, tstate, batch,
                                          jax.random.PRNGKey(42))
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)), f'{k} not finite: {v}'
    assert np.asarray(metrics['total_loss']) > 0
    assert int(new_state.step) == 1
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params,
        new_state.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    # frozen pseudo reference points must NOT move (farhead.py:438)
    old = state.params['pts_head']['pseudo_reference_points']
    new = new_state.params['pts_head']['pseudo_reference_points']
    np.testing.assert_array_equal(np.asarray(old), np.asarray(new))


def test_train_step_dp_mesh_matches_single_device(setup):
    """Data-parallel over the virtual 8-device CPU mesh must be numerically
    equivalent to a single-device step on the identical global batch — the
    reference semantics being matched are DDP's gradient allreduce +
    reduce_mean normalizers (mmdet_train.py:79-83, farhead.py:1027-1037);
    same equality bar as test_cam_shard.py for camera sharding."""
    cfg, _, _, _, _ = setup
    from far3d_tpu.parallel.mesh import make_mesh, shard_batch
    ndev = len(jax.devices())
    assert ndev == 8, f'expected 8 virtual devices, got {ndev}'
    state, tstate = create_train_state(cfg, jax.random.PRNGKey(0), batch=ndev)
    batch = synthetic_batch(cfg, batch=ndev)
    step = jax.jit(make_train_step(cfg, use_gt_depth=True))

    # single-device reference: same global batch, everything on one device
    want_state, want_tstate, want_metrics = step(state, tstate, batch,
                                                 jax.random.PRNGKey(1))

    mesh = make_mesh()
    with jax.set_mesh(mesh):
        sbatch = shard_batch(mesh, batch)
        ststate = shard_batch(mesh, tstate)
        new_state, new_tstate, metrics = step(state, ststate, sbatch,
                                              jax.random.PRNGKey(1))
        got_total = float(np.asarray(metrics['total_loss']))
        got_params = jax.device_get(new_state.params)
        got_embed = np.asarray(new_tstate.embedding)

    assert np.isfinite(got_total)
    np.testing.assert_allclose(
        got_total, float(np.asarray(want_metrics['total_loss'])), rtol=1e-4)
    # updated params: lane math is identical, only the cross-lane loss/grad
    # reduction order differs (allreduce), so tolerances are reassociation-
    # sized relative to the AdamW update scale (~lr)
    flat_want, treedef = jax.tree_util.tree_flatten(want_state.params)
    flat_got = treedef.flatten_up_to(got_params)
    for w, g in zip(flat_want, flat_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-5)
    # sharded temporal carry comes back equal too
    np.testing.assert_allclose(got_embed, np.asarray(want_tstate.embedding),
                               rtol=1e-3, atol=1e-4)


def test_ema_params_track(setup):
    """EMA shadow follows params with the warmup-ramped decay
    (cfg.train.ema_decay; torch ExponentialMovingAverage convention)."""
    import dataclasses
    cfg, _, _, batch, _ = setup
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, ema_decay=0.9))
    state, tstate = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    assert state.ema_params is not None
    step = jax.jit(make_train_step(cfg, use_gt_depth=True))
    s1, tstate, _ = step(state, tstate, batch, jax.random.PRNGKey(1))
    # step 0: ramp d = min(0.9, 1/10) = 0.1 -> ema = 0.1*old + 0.9*new
    d = 0.1
    expect = jax.tree_util.tree_map(
        lambda e, p: e * d + p * (1 - d), state.params, s1.params)
    err = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), expect, s1.ema_params)
    assert max(jax.tree_util.tree_leaves(err)) < 1e-5
    # ema differs from raw params once they move
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s1.params, s1.ema_params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
