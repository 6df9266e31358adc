#!/usr/bin/env python
"""Visualization tool (reference: tools/visualize.py / test_and_visualize.py /
tools/visual/vis_av2.py): render predicted + GT 3D boxes onto the camera
images and a BEV canvas, per frame.

python tools/visualize.py --data-root data/av2 --checkpoint work_dirs/far3d \
    --out-dir vis --num-frames 20
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def box_corners(box7):
    x, y, z, l, w, h, yaw = box7[:7]
    dx, dy, dz = l / 2, w / 2, h / 2
    corners = np.array([[sx * dx, sy * dy, sz * dz]
                        for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return corners @ rot.T + np.array([x, y, z])


EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7), (6, 7),
         (0, 4), (1, 5), (2, 6), (3, 7)]


def draw_boxes_camera(img, boxes, lidar2img, color):
    import cv2
    h, w = img.shape[:2]
    for b in boxes:
        corners = box_corners(b)
        pts = np.concatenate([corners, np.ones((8, 1))], 1) @ lidar2img.T
        if (pts[:, 2] < 0.1).all():
            continue
        uv = pts[:, :2] / np.maximum(pts[:, 2:3], 1e-5)
        for i, j in EDGES:
            if pts[i, 2] > 0.1 and pts[j, 2] > 0.1:
                p0 = tuple(np.round(uv[i]).astype(int))
                p1 = tuple(np.round(uv[j]).astype(int))
                cv2.line(img, p0, p1, color, 1, cv2.LINE_AA)
    return img


def draw_bev(pred_boxes, gt_boxes, extent=160.0, size=800):
    import cv2
    canvas = np.full((size, size, 3), 30, np.uint8)
    scale = size / (2 * extent)

    def to_px(xy):
        return (int(size / 2 + xy[0] * scale), int(size / 2 - xy[1] * scale))

    for boxes, color in ((gt_boxes, (80, 200, 80)),
                         (pred_boxes, (80, 80, 230))):
        for b in boxes:
            corners = box_corners(b)[:4, :2][[0, 1, 3, 2]]
            pts = np.array([to_px(c) for c in corners], np.int32)
            cv2.polylines(canvas, [pts], True, color, 1, cv2.LINE_AA)
    cv2.circle(canvas, to_px((0, 0)), 4, (255, 255, 255), -1)
    return canvas


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-root', required=True)
    p.add_argument('--ann-file', default=None)
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--torch-checkpoint', default=None)
    p.add_argument('--out-dir', default='vis')
    p.add_argument('--num-frames', type=int, default=10)
    p.add_argument('--score-thr', type=float, default=0.3)
    args = p.parse_args()

    import cv2
    import jax
    from far3d_tpu.config import Far3DConfig
    from far3d_tpu.data.av2_dataset import AV2SequenceDataset
    from far3d_tpu.data.loader import EvalLoader
    from far3d_tpu.eval.runner import run_inference
    from far3d_tpu.train.step import create_train_state
    from far3d_tpu.utils.checkpoint import CheckpointManager

    cfg = Far3DConfig()
    ann = args.ann_file or f'{args.data_root}/av2_val_infos.pkl'
    dataset = AV2SequenceDataset(ann, args.data_root, split='val',
                                 test_mode=False, seq_split_num=1)
    state, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    if args.torch_checkpoint:
        from far3d_tpu.utils.torch_convert import (convert_state_dict,
                                                   load_torch_checkpoint)
        out, _ = convert_state_dict(
            load_torch_checkpoint(args.torch_checkpoint), cfg,
            {'params': state.params, 'stats': state.stats,
             'batch_stats': state.batch_stats})
        variables = out
    else:
        mgr = CheckpointManager(args.checkpoint)
        state = mgr.restore(state)
        variables = {'params': state.params, 'stats': state.stats,
                     'batch_stats': state.batch_stats}

    loader = EvalLoader(dataset, cfg)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    results = run_inference(cfg, variables, loader)
    for k, det in enumerate(results[:args.num_frames]):
        rec = dataset.get_frame(det['index'])
        keep = det['scores'] > args.score_thr
        pred = det['boxes'][keep]
        gt = rec.get('gt_boxes_3d', np.zeros((0, 7)))
        for ci, path in enumerate(rec['img_paths']):
            img = cv2.imread(path)
            if img is None:
                continue
            draw_boxes_camera(img, gt, rec['lidar2img'][ci], (80, 200, 80))
            draw_boxes_camera(img, pred, rec['lidar2img'][ci], (80, 80, 230))
            cv2.imwrite(str(out_dir / f'frame{k:04d}_cam{ci}.jpg'), img)
        cv2.imwrite(str(out_dir / f'frame{k:04d}_bev.jpg'),
                    draw_bev(pred, gt))
        print(f'frame {k}: {len(pred)} preds, {len(gt)} gts')


if __name__ == '__main__':
    main()
