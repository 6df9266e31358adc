"""Golden-output regression tests: deterministic tiny-config forward and
train-step against recorded outputs.

The reference has no numeric regression net at all (SURVEY §4); any refactor
is only checked by a full eval run. Here the full detector forward (CPU, f32)
and one train step are pinned to recorded golden arrays so that unintended
numeric drift from refactors (kernel wrappers, op reorderings, fusion
changes) fails CI immediately.

Regenerate after an *intended* numeric change:
    rm tests/data/golden_tiny.npz && JAX_PLATFORMS=cpu python -m pytest \
        tests/test_golden.py -q
The first run records, prints a notice, and passes; commit the new file.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from far3d_tpu import Far3D, decode_detections, init_state, tiny_test_config
from far3d_tpu.train.step import create_train_state, make_train_step
from far3d_tpu.utils.synthetic import synthetic_batch

GOLDEN = pathlib.Path(__file__).parent / 'data' / 'golden_tiny.npz'


def _forward_outputs():
    cfg = tiny_test_config()
    model = Far3D(cfg)
    b, n = 1, cfg.data.num_cams
    h, w = cfg.data.input_hw
    imgs = jax.random.normal(jax.random.PRNGKey(0), (b, n, h, w, 3),
                             jnp.float32)
    intr = jnp.tile(jnp.eye(4)[None, None], (b, n, 1, 1))
    intr = intr.at[:, :, 0, 0].set(w / 2).at[:, :, 1, 1].set(w / 2)
    intr = intr.at[:, :, 0, 2].set(w / 2).at[:, :, 1, 2].set(h / 2)
    extr = jnp.tile(jnp.eye(4)[None, None], (b, n, 1, 1))
    lidar2img = jnp.einsum('bnij,bnjk->bnik', intr, extr)
    data = dict(
        images=imgs, lidar2img=lidar2img, intrinsics=intr, extrinsics=extr,
        state=init_state(b, cfg.head), prev_exists=jnp.zeros((b,)),
        timestamp=jnp.zeros((b,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (b, 1, 1)))
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), **data)
    out = jax.jit(model.apply)(variables, **data)
    # second frame with carried memory: covers the temporal path
    data2 = dict(data, state=out['state'], prev_exists=jnp.ones((b,)),
                 timestamp=jnp.ones((b,)))
    out2 = jax.jit(model.apply)(variables, **data2)
    dets = decode_detections(out2['all_cls_scores'][-1],
                             out2['all_bbox_preds'][-1],
                             out2['query_valid'], cfg)
    return {
        'cls_f1': np.asarray(out['all_cls_scores'], np.float32),
        'bbox_f1': np.asarray(out['all_bbox_preds'], np.float32),
        'cls_f2': np.asarray(out2['all_cls_scores'], np.float32),
        'bbox_f2': np.asarray(out2['all_bbox_preds'], np.float32),
        'mem_embed_f2': np.asarray(out2['state'].embedding, np.float32),
        'det_boxes': np.asarray(dets['boxes'], np.float32),
        'det_scores': np.asarray(dets['scores'], np.float32),
    }


def _train_outputs():
    cfg = tiny_test_config()
    state, tstate = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    batch = synthetic_batch(cfg, batch=1)
    step = jax.jit(make_train_step(cfg, use_gt_depth=True))
    _, _, metrics = step(state, tstate, batch, jax.random.PRNGKey(42))
    return {f'loss_{k}': np.asarray(v, np.float32)
            for k, v in sorted(metrics.items())}


@pytest.fixture(scope='module')
def golden():
    current = {}
    current.update(_forward_outputs())
    current.update(_train_outputs())
    if not GOLDEN.exists():
        GOLDEN.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(GOLDEN, **current)
        pytest.skip(f'golden file recorded at {GOLDEN}; commit it')
    return dict(np.load(GOLDEN)), current


def test_forward_matches_golden(golden):
    recorded, current = golden
    for k in ('cls_f1', 'bbox_f1', 'cls_f2', 'bbox_f2', 'mem_embed_f2',
              'det_boxes', 'det_scores'):
        np.testing.assert_allclose(
            current[k], recorded[k], rtol=1e-4, atol=1e-4,
            err_msg=f'golden drift in {k} — if intended, regenerate '
                    f'(see module docstring)')


def test_train_step_matches_golden(golden):
    recorded, current = golden
    keys = [k for k in recorded if k.startswith('loss_')]
    assert keys, 'no recorded loss keys'
    for k in keys:
        assert k in current, f'loss term {k} disappeared'
        np.testing.assert_allclose(
            current[k], recorded[k], rtol=5e-4, atol=5e-4,
            err_msg=f'golden drift in {k}')
