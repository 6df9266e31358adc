#!/usr/bin/env python
"""Data-pipeline label check (reference: tools/visual/check_img_label.py —
de-normalize pipeline images and overlay every label the pipeline emits, to
catch transform/intrinsics misalignment by eye).

Per camera it draws:
  * 2D GT boxes + centers (green), center dots colored by GT depth
  * projected 3D GT wireframes through the ida-adjusted lidar2img (yellow)
  * the painted foreground depth-bin map as a translucent overlay

python tools/check_img_label.py --data-root data/av2 --train-aug
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()

from _common import add_common_args, build_dataset  # noqa


def main():
    p = add_common_args(argparse.ArgumentParser())
    p.add_argument('--train-aug', action='store_true',
                   help='run the training pipeline (random resize) instead '
                        'of the deterministic eval transform')
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()

    import cv2
    from far3d_tpu.config import Far3DConfig
    from far3d_tpu.data.pipeline import process_frame
    from far3d_tpu.utils.vis import (GT_COLOR, denormalize_image,
                                     depth_color, draw_boxes_2d,
                                     draw_boxes_camera, draw_points)

    cfg = Far3DConfig()
    dataset = build_dataset(cfg, args, split='train')
    rng = np.random.default_rng(args.seed)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    h8 = cfg.data.input_hw[0] // cfg.depthnet.stride
    w8 = cfg.data.input_hw[1] // cfg.depthnet.stride
    for k in range(min(args.num_frames, len(dataset))):
        rec = dataset.get_frame(k)
        frame = process_frame(rec, cfg, rng, train=args.train_aug)
        gt3d = rec.get('gt_boxes_3d', np.zeros((0, 7)))
        for ci in range(frame['images'].shape[0]):
            img = np.ascontiguousarray(denormalize_image(
                frame['images'][ci], cfg.data.img_mean, cfg.data.img_std))
            # depth-bin painting overlay (upsampled x stride)
            fg = frame['gt_depth_fg'][ci].reshape(h8, w8)
            if fg.any():
                bins = frame['gt_depth_bins'][ci].reshape(h8, w8)
                heat = np.zeros((h8, w8, 3), np.uint8)
                heat[fg] = depth_color(
                    bins[fg].astype(np.float32), cfg.depthnet.num_depth_bins)
                heat = cv2.resize(heat, (img.shape[1], img.shape[0]),
                                  interpolation=cv2.INTER_NEAREST)
                m = heat.any(-1, keepdims=True)
                img = np.where(m, (0.5 * img + 0.5 * heat).astype(np.uint8),
                               img)
            sel = frame['gt_mask2d'][ci]
            draw_boxes_2d(img, frame['gt_boxes2d'][ci][sel], GT_COLOR)
            centers = frame['gt_centers2d'][ci][sel]
            # depth recovered from the painted bins is coarse; color dots by
            # the 2D GT depth the pipeline carried before painting
            draw_points(img, centers, color=GT_COLOR, radius=3)
            draw_boxes_camera(img, gt3d, frame['lidar2img'][ci],
                              color=(60, 220, 220))
            cv2.imwrite(str(out_dir / f'check_f{k:04d}_cam{ci}.jpg'), img)
        n2d = int(frame['gt_mask2d'].sum())
        print(f'frame {k}: {n2d} 2D GTs across cams, {len(gt3d)} 3D GTs, '
              f'{int(frame["gt_depth_fg"].sum())} painted depth px')


if __name__ == '__main__':
    main()
