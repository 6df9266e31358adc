"""Visualization suite: drawing utilities + decoder observability.

Covers the building blocks behind tools/vis_yolox.py, tools/vis_attention.py,
tools/check_img_label.py, tools/test_and_visualize.py (reference analogues:
tools/visual/*)."""

import numpy as np
import pytest

from far3d_tpu.utils.vis import (box_corners, denormalize_image, depth_color,
                                 draw_bev, draw_boxes_2d, draw_boxes_camera,
                                 draw_points)


def test_box_corners_geometry():
    c = box_corners(np.array([1.0, 2.0, 3.0, 4.0, 2.0, 1.0, 0.0]))
    assert c.shape == (8, 3)
    assert np.allclose(c.mean(0), [1.0, 2.0, 3.0])
    assert np.isclose(c[:, 0].max() - c[:, 0].min(), 4.0)  # length along x
    # yaw=pi/2 rotates length onto y
    cr = box_corners(np.array([0, 0, 0, 4.0, 2.0, 1.0, np.pi / 2]))
    assert np.isclose(cr[:, 1].max() - cr[:, 1].min(), 4.0)


def test_draw_functions_run():
    cv2 = pytest.importorskip('cv2')  # noqa: F841
    img = np.zeros((64, 96, 3), np.uint8)
    l2i = np.eye(4)
    l2i[0, 0] = l2i[1, 1] = 50.0
    l2i[0, 2] = 48.0
    l2i[1, 2] = 32.0
    boxes = np.array([[0.0, 0.0, 5.0, 1.0, 1.0, 1.0, 0.3]])
    out = draw_boxes_camera(img.copy(), boxes, l2i)
    assert out.any()  # something was drawn in front of the camera
    bev = draw_bev(boxes, boxes, extent=20.0, size=128)
    assert bev.shape == (128, 128, 3)
    img2 = draw_boxes_2d(img.copy(), np.array([[10.0, 10, 50, 40]]),
                         scores=np.array([0.7]))
    assert img2.any()
    img3 = draw_points(img.copy(), np.array([[20.0, 20.0], [-5.0, 3.0]]))
    assert img3.any()


def test_denormalize_and_depth_color():
    mean, std = (103.5, 116.3, 123.7), (57.4, 57.1, 58.4)
    raw = np.random.RandomState(0).randint(0, 255, (8, 8, 3)).astype(np.float32)
    norm = (raw - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    rec = denormalize_image(norm, mean, std)
    assert rec.dtype == np.uint8
    assert np.abs(rec.astype(np.float32) - raw).max() < 1.0
    cols = depth_color(np.array([0.0, 30.0, 60.0]))
    assert cols.shape == (3, 3) and cols.dtype == np.uint8
    assert not np.array_equal(cols[0], cols[2])  # near and far differ


def test_decoder_sows_sampling_intermediates():
    import jax
    import jax.numpy as jnp
    from far3d_tpu import Far3D
    from far3d_tpu.config import tiny_test_config
    from far3d_tpu.models.farhead import init_state
    from far3d_tpu.utils.synthetic import synthetic_batch

    cfg = tiny_test_config()
    model = Far3D(cfg)
    data = synthetic_batch(cfg, batch=1, as_dict=True)
    kwargs = dict(
        images=jnp.asarray(data['images']),
        lidar2img=jnp.asarray(data['lidar2img']),
        intrinsics=jnp.asarray(data['intrinsics']),
        extrinsics=jnp.asarray(data['extrinsics']),
        prev_exists=jnp.zeros((1,)), timestamp=jnp.zeros((1,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (1, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (1, 1, 1)))
    tstate = init_state(1, cfg.head)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), state=tstate,
                                    **kwargs)
    out, mods = model.apply(variables, state=tstate,
                            mutable=['intermediates'], **kwargs)
    inter = mods['intermediates']['pts_head']['decoder']
    q_total = out['all_cls_scores'].shape[2]
    for li in range(cfg.decoder.num_layers):
        agg = inter[f'layer{li}']['cross_attn']
        loc = agg['sampling_loc'][0]
        w = agg['attn_weights'][0]
        assert loc.shape == (cfg.data.num_cams, q_total,
                             cfg.deform.num_pts, 2)
        assert w.shape[0] == cfg.data.num_cams and w.shape[1] == q_total
        # softmax over cams x levels x pts, per group -> sums to 1 per query
        per_group = np.asarray(w.sum(axis=(0, 3, 4)))
        np.testing.assert_allclose(per_group,
                                   np.ones_like(per_group), rtol=1e-3)


def test_nusc_composite_render(tmp_path):
    """tools/visualize_nusc.py's composite renderer (reference counterpart:
    tools/visual_nuscenes.py 6-cam + BEV composite) on the synthetic
    nuScenes disk fixture."""
    cv2 = pytest.importorskip('cv2')  # noqa: F841
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tools'))
    from visualize_nusc import render_nusc_frame

    from far3d_tpu.data.nuscenes_dataset import NuScenesSequenceDataset
    from far3d_tpu.utils.synthetic import make_learnable_nusc_dataset

    ann = tmp_path / 'infos.pkl'
    make_learnable_nusc_dataset(str(ann), str(tmp_path), n_scenes=1,
                                frames_per_scene=2)
    dataset = NuScenesSequenceDataset(str(ann), str(tmp_path),
                                      seq_split_num=1)
    rec = dataset.get_frame(0)
    n_cams = len(rec['img_paths'])
    # a fake decode-order detection (x, y, z_bottom, w, l, h, yaw, vx, vy)
    det = dict(boxes=np.array([[8.0, 0.0, 1.0, 1.2, 1.0, 1.2, 0.3, 0, 0]]),
               scores=np.array([0.9]), labels=np.array([0]))
    comp = render_nusc_frame(rec, det, score_thr=0.3)
    assert comp.ndim == 3 and comp.dtype == np.uint8
    # grid: ceil(n_cams/3) rows of 3 tiles + BEV panel appended on the right
    rows = -(-n_cams // 3)
    assert comp.shape[0] % rows == 0
    tile_h = comp.shape[0] // rows
    assert comp.shape[1] > 3 * 400  # 3 columns of 400 px + BEV
    assert comp.any()
    # empty detections must still render (GT-only composite)
    det0 = dict(boxes=np.zeros((0, 9)), scores=np.zeros(0),
                labels=np.zeros(0, np.int64))
    comp0 = render_nusc_frame(rec, det0, score_thr=0.3)
    assert comp0.shape == comp.shape
