#!/usr/bin/env python
"""nuScenes visualization for the StreamPETR family (reference:
tools/visual_nuscenes.py:1-2287 — the 6-camera + BEV composite renderer):
per frame, draw predicted (red) and GT (green) 3D wireframes onto every raw
camera image, compose them into a 2x3 surround grid with a BEV panel on the
right, and write one composite jpg per frame.

python tools/visualize_nusc.py --data-root data/nuscenes \
    [--checkpoint work_dirs/streampetr | --random-init] \
    [--out-dir vis_nusc] [--num-frames 20] [--score-thr 0.3]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()


def _to_draw_boxes(boxes9: np.ndarray, bottom_z: bool) -> np.ndarray:
    """decode_boxes rows (x, y, z, w, l, h, yaw[, vx, vy]) -> the drawing
    layout box_corners expects ([x, y, z_gravity, l, w, h, yaw])."""
    if len(boxes9) == 0:
        return np.zeros((0, 7))
    b = np.asarray(boxes9, np.float64)[:, :7].copy()
    if bottom_z:
        b[:, 2] += b[:, 5] / 2
    b[:, [3, 4]] = b[:, [4, 3]]
    return b


def render_nusc_frame(rec, det, score_thr: float = 0.3,
                      bev_extent: float = 65.0) -> np.ndarray:
    """One frame's composite: raw camera images with GT/pred wireframes +
    BEV. `rec` is a NuScenesSequenceDataset frame record; `det` a
    run_inference_petr result dict (boxes/scores/labels in decode order)."""
    import cv2

    from far3d_tpu.utils.vis import (GT_COLOR, PRED_COLOR, compose_camera_grid,
                                     draw_bev, draw_boxes_camera)
    keep = np.asarray(det['scores']) > score_thr
    pred = _to_draw_boxes(np.asarray(det['boxes'])[keep], bottom_z=True)
    gt = _to_draw_boxes(rec.get('gt_boxes_3d', np.zeros((0, 7))),
                        bottom_z=False)
    cams = []
    for ci, path in enumerate(rec['img_paths']):
        img = cv2.imread(path)
        if img is None:   # fixture-less smoke runs: draw on a dark canvas
            img = np.full((450, 800, 3), 20, np.uint8)
        draw_boxes_camera(img, gt, rec['lidar2img'][ci], GT_COLOR)
        draw_boxes_camera(img, pred, rec['lidar2img'][ci], PRED_COLOR)
        cams.append(img)
    bev = draw_bev(pred, gt, extent=bev_extent, size=800)
    return compose_camera_grid(cams, cols=3, bev=bev)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-root', required=True)
    p.add_argument('--ann-file', default=None)
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--random-init', action='store_true')
    p.add_argument('--src-wh', type=int, nargs=2, default=(1600, 900))
    p.add_argument('--out-dir', default='vis_nusc')
    p.add_argument('--num-frames', type=int, default=10)
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--set', dest='overrides', action='append', default=[],
                   metavar='KEY=VAL', help='dotted StreamPETRConfig overrides')
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from far3d_tpu.config import apply_overrides
    from far3d_tpu.data.loader import EvalLoader
    from far3d_tpu.data.nuscenes_dataset import NuScenesSequenceDataset
    from far3d_tpu.eval.petr_runner import (petr_host_config,
                                            run_inference_petr)
    from far3d_tpu.models.streampetr import (StreamPETR, StreamPETRConfig,
                                             init_petr_state)

    cfg = apply_overrides(StreamPETRConfig(), args.overrides)
    ann = args.ann_file or \
        f'{args.data_root}/nuscenes2d_temporal_infos_val.pkl'
    dataset = NuScenesSequenceDataset(ann, args.data_root, seq_split_num=1)
    host_cfg = petr_host_config(cfg, tuple(args.src_wh))

    model = StreamPETR(cfg)
    h, w = cfg.input_hw
    init_kw = dict(
        images=jnp.zeros((1, cfg.num_cams, h, w, 3)),
        lidar2img=jnp.tile(jnp.eye(4)[None, None], (1, cfg.num_cams, 1, 1)),
        state=init_petr_state(1, cfg),
        prev_exists=jnp.zeros((1,)), timestamp=jnp.zeros((1,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (1, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (1, 1, 1)))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **init_kw)
    if args.checkpoint:
        from far3d_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(args.checkpoint)
        restored = mgr.restore({'params': variables['params'],
                                'stats': variables.get('stats', {})})
        if restored is None:
            raise SystemExit(f'no checkpoint found in {args.checkpoint}')
        variables = restored
        mgr.close()
    elif not args.random_init:
        raise SystemExit('need --checkpoint or --random-init')

    loader = EvalLoader(dataset, host_cfg, max_frames=args.num_frames)
    results = run_inference_petr(cfg, variables, loader)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for k, det in enumerate(results):
        rec = dataset.get_frame(det['index'])
        comp = render_nusc_frame(rec, det, args.score_thr)
        cv2.imwrite(str(out_dir / f'frame{k:04d}.jpg'), comp)
        n = int((np.asarray(det['scores']) > args.score_thr).sum())
        print(f'frame {k}: {n} preds, '
              f'{len(rec.get("gt_boxes_3d", []))} gts')


if __name__ == '__main__':
    main()
