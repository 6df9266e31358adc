"""End-to-end smoke tests: init + forward on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from far3d_tpu import Far3D, decode_detections, init_state, tiny_test_config


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_test_config()
    model = Far3D(cfg)
    b, n = 1, cfg.data.num_cams
    h, w = cfg.data.input_hw
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (b, n, h, w, 3), jnp.float32)
    # plausible pinhole intrinsics + identity-ish extrinsics
    intr = jnp.tile(jnp.eye(4)[None, None], (b, n, 1, 1))
    intr = intr.at[:, :, 0, 0].set(float(w) / 2).at[:, :, 1, 1].set(float(w) / 2)
    intr = intr.at[:, :, 0, 2].set(w / 2).at[:, :, 1, 2].set(h / 2)
    extr = jnp.tile(jnp.eye(4)[None, None], (b, n, 1, 1))
    lidar2img = jnp.einsum('bnij,bnjk->bnik', intr, extr)
    state = init_state(b, cfg.head)
    data = dict(
        images=imgs, lidar2img=lidar2img, intrinsics=intr, extrinsics=extr,
        state=state, prev_exists=jnp.zeros((b,)), timestamp=jnp.zeros((b,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), **data)
    apply = jax.jit(model.apply)
    return cfg, model, variables, data, apply


def test_forward_shapes(setup):
    cfg, model, variables, data, apply = setup
    out = apply(variables, **data)
    nq = cfg.head.num_query
    k2d = cfg.roi2d.num_proposals_2d * cfg.head.multi_depth.topk
    total = nq + k2d + cfg.head.num_propagated
    assert out['all_cls_scores'].shape == (
        cfg.decoder.num_layers, 1, total, cfg.num_classes)
    assert out['all_bbox_preds'].shape == (
        cfg.decoder.num_layers, 1, total, cfg.head.code_size)
    assert np.isfinite(np.asarray(out['all_cls_scores'])).all()
    assert np.isfinite(np.asarray(out['all_bbox_preds'])).all()


def test_temporal_state_carry(setup):
    cfg, model, variables, data, apply = setup
    out = apply(variables, **data)
    st = out['state']
    assert st.embedding.shape == (1, cfg.head.memory_len, cfg.head.embed_dims)
    # second frame with memory carried and prev_exists=1
    data2 = dict(data)
    data2['state'] = st
    data2['prev_exists'] = jnp.ones((1,))
    data2['timestamp'] = jnp.ones((1,))
    out2 = apply(variables, **data2)
    assert np.isfinite(np.asarray(out2['all_cls_scores'])).all()
    # memory should now be populated (non-zero embeddings)
    assert np.abs(np.asarray(out2['state'].embedding)).max() > 0


def test_decode(setup):
    cfg, model, variables, data, apply = setup
    out = apply(variables, **data)
    dets = decode_detections(out['all_cls_scores'][-1],
                             out['all_bbox_preds'][-1],
                             out['query_valid'], cfg)
    k = cfg.head.max_decode_num
    assert dets['boxes'].shape == (1, k, 9)
    assert dets['scores'].shape == (1, k)
    assert dets['labels'].shape == (1, k)


def test_scene_reset_equals_fresh_state(setup):
    """prev_exists=0 must fully neutralize whatever is in the carried state
    (memory_refresh semantics, misc.py:7-11): outputs match a zero state."""
    from far3d_tpu import init_state
    cfg, model, variables, data, apply = setup
    out = apply(variables, **data)
    dirty = out['state']
    d_fresh = dict(data)
    d_fresh['prev_exists'] = jnp.zeros((1,))
    d_dirty = dict(d_fresh)
    d_dirty['state'] = dirty
    o1 = apply(variables, **d_fresh)
    o2 = apply(variables, **d_dirty)
    np.testing.assert_allclose(np.asarray(o1['all_cls_scores']),
                               np.asarray(o2['all_cls_scores']),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o1['all_bbox_preds']),
                               np.asarray(o2['all_bbox_preds']),
                               rtol=1e-3, atol=1e-3)


def test_config_overrides_roundtrip():
    """--set style dotted overrides (reference --cfg-options,
    tools/train.py:64-73): literals parsed, nesting rebuilt immutably,
    unknown keys rejected."""
    import pytest
    from far3d_tpu.config import Far3DConfig, apply_overrides

    cfg = Far3DConfig()
    out = apply_overrides(cfg, [
        'head.dn_groups=8',
        'train.lr=1e-4',
        'roi2d.num_proposals_2d=128',
        'backbone.remat=False',
        'data.input_hw=(320, 480)',
        'train.dtype=float32',
    ])
    assert out.head.dn_groups == 8
    assert out.train.lr == 1e-4
    assert out.roi2d.num_proposals_2d == 128
    assert out.backbone.remat is False
    assert out.data.input_hw == (320, 480)
    assert out.train.dtype == 'float32'
    # original untouched (frozen dataclasses)
    assert cfg.head.dn_groups == 10 and cfg.train.lr == 2e-4

    with pytest.raises(KeyError):
        apply_overrides(cfg, ['head.not_a_field=1'])
    with pytest.raises(ValueError):
        apply_overrides(cfg, ['head.dn_groups'])
    with pytest.raises(TypeError):
        apply_overrides(cfg, ['train.lr=not_a_number'])
