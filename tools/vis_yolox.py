#!/usr/bin/env python
"""2D proposal visualization (reference: tools/visual/vis_yolox.py:60-109 —
decode YOLOX priors, draw predicted 2D boxes/centers and GTs per camera).

Draws the detector's static top-K proposals (score-annotated, red) and the
pipeline's 2D GT boxes (green) on the network-input images.

python tools/vis_yolox.py --data-root data/av2 --checkpoint work_dirs/far3d
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()

from _common import add_common_args, build_dataset, load_variables  # noqa


def main():
    args = add_common_args(argparse.ArgumentParser()).parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from far3d_tpu.config import Far3DConfig
    from far3d_tpu.data.loader import EvalLoader
    from far3d_tpu.models.farhead import init_state
    from far3d_tpu.utils.vis import (GT_COLOR, PRED_COLOR, denormalize_image,
                                     draw_boxes_2d, draw_points)
    from far3d_tpu import Far3D

    cfg = Far3DConfig()
    variables = load_variables(cfg, args)
    dataset = build_dataset(cfg, args)
    model = Far3D(cfg)

    @jax.jit
    def forward(variables, tstate, kw):
        out = model.apply(variables, state=tstate, **kw)
        return out['proposals'], out['state']

    tstate = init_state(1, cfg.head)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    loader = EvalLoader(dataset, cfg, max_frames=args.num_frames)
    for k, frame in enumerate(loader):
        batch = {key: jnp.asarray(v)[None] for key, v in frame.items()
                 if key in ('images', 'lidar2img', 'intrinsics', 'extrinsics',
                            'timestamp', 'prev_exists', 'ego_pose',
                            'ego_pose_inv')}
        props, tstate = forward(variables, tstate, batch)
        boxes = np.asarray(props['boxes'][0])           # (K, 4) cxcywh px
        scores = np.asarray(props['scores'][0]).reshape(-1)
        cam_idx = np.asarray(props['cam_idx'][0])
        valid = np.asarray(props['valid'][0])
        xyxy = np.concatenate([boxes[:, :2] - boxes[:, 2:] / 2,
                               boxes[:, :2] + boxes[:, 2:] / 2], axis=1)
        for ci in range(frame['images'].shape[0]):
            img = denormalize_image(frame['images'][ci], cfg.data.img_mean,
                                    cfg.data.img_std)
            img = np.ascontiguousarray(img)
            sel = valid & (cam_idx == ci)
            draw_boxes_2d(img, xyxy[sel], PRED_COLOR, scores=scores[sel])
            if 'gt_boxes2d' in frame:
                gsel = frame['gt_mask2d'][ci]
                draw_boxes_2d(img, frame['gt_boxes2d'][ci][gsel], GT_COLOR)
                draw_points(img, frame['gt_centers2d'][ci][gsel],
                            color=GT_COLOR, radius=3)
            cv2.imwrite(str(out_dir / f'yolox_f{k:04d}_cam{ci}.jpg'), img)
        print(f'frame {k}: {int(valid.sum())} proposals > thr '
              f'(max score {scores.max():.3f})')


if __name__ == '__main__':
    main()
