"""Camera-sharded inference (parallel/cam_shard.py): sharded == unsharded
numerics on the virtual CPU mesh, and the per-camera inputs are actually
distributed (not replicated) across the mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from far3d_tpu import Far3D, init_state, tiny_test_config
from far3d_tpu.parallel.cam_shard import (CAM_AXIS, make_cam_mesh,
                                          make_cam_sharded_infer)


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_test_config()      # 2 cameras -> a 2-device cam mesh
    model = Far3D(cfg)
    b, n = 1, cfg.data.num_cams
    h, w = cfg.data.input_hw
    imgs = jax.random.normal(jax.random.PRNGKey(0), (b, n, h, w, 3),
                             jnp.float32)
    intr = jnp.tile(jnp.eye(4)[None, None], (b, n, 1, 1))
    intr = intr.at[:, :, 0, 0].set(w / 2).at[:, :, 1, 1].set(w / 2)
    intr = intr.at[:, :, 0, 2].set(w / 2).at[:, :, 1, 2].set(h / 2)
    extr = jnp.tile(jnp.eye(4)[None, None], (b, n, 1, 1))
    kwargs = dict(
        images=imgs,
        lidar2img=jnp.einsum('bnij,bnjk->bnik', intr, extr),
        intrinsics=intr, extrinsics=extr,
        prev_exists=jnp.zeros((b,)), timestamp=jnp.zeros((b,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (b, 1, 1)))
    tstate = init_state(b, cfg.head)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), state=tstate,
                                    **kwargs)
    return cfg, model, variables, tstate, kwargs


def test_cam_sharded_matches_unsharded(setup):
    cfg, model, variables, tstate, kwargs = setup
    from far3d_tpu.models.detector import decode_detections

    out = jax.jit(model.apply)(variables, state=tstate, **kwargs)
    want = decode_detections(out['all_cls_scores'][-1],
                             out['all_bbox_preds'][-1],
                             out['query_valid'], cfg)

    mesh = make_cam_mesh(cfg.data.num_cams)
    run = make_cam_sharded_infer(model, cfg, mesh)
    dets, new_state = run(variables, tstate, kwargs)

    np.testing.assert_allclose(np.asarray(dets['scores']),
                               np.asarray(want['scores']),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dets['boxes']),
                               np.asarray(want['boxes']),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(new_state.embedding),
                               np.asarray(out['state'].embedding),
                               rtol=1e-4, atol=1e-4)
    # second frame with the carried (replicated) state still runs sharded
    kwargs2 = dict(kwargs, prev_exists=jnp.ones((1,)),
                   timestamp=jnp.ones((1,)))
    dets2, _ = run(variables, new_state, kwargs2)
    assert np.isfinite(np.asarray(dets2['scores'])).all()


def test_cam_inputs_actually_sharded(setup):
    cfg, model, variables, tstate, kwargs = setup
    mesh = make_cam_mesh(cfg.data.num_cams)
    from far3d_tpu.parallel.cam_shard import cam_shardings
    sh = cam_shardings(mesh, kwargs)
    imgs = jax.device_put(kwargs['images'], sh['images'])
    # each of the 2 mesh devices should hold exactly one camera's pixels
    shard_shapes = {s.data.shape for s in imgs.addressable_shards}
    n = cfg.data.num_cams
    assert len(imgs.addressable_shards) == n
    assert shard_shapes == {(1, 1) + kwargs['images'].shape[2:]}
    assert CAM_AXIS in mesh.axis_names
