#!/usr/bin/env python
"""Evaluate and dump visualizations in one pass (reference:
tools/test_and_visualize.py:1-283 — run the test loop, compute metrics, and
write per-frame rendered images).

python tools/test_and_visualize.py --data-root data/av2 \
    --checkpoint work_dirs/far3d --out-dir vis --num-frames 40
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
    p = add_common_args(argparse.ArgumentParser())
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--eval-range', type=float, default=None)
    p.add_argument('--max-eval-frames', type=int, default=None,
                   help='cap the evaluated shard (visualized frames always '
                        'come from its head)')
    args = p.parse_args()

    import cv2
    from far3d_tpu.config import Far3DConfig
    from far3d_tpu.data.loader import EvalLoader
    from far3d_tpu.eval.runner import collect_and_evaluate, run_inference
    from far3d_tpu.utils.vis import draw_bev, draw_boxes_camera

    cfg = Far3DConfig()
    variables = load_variables(cfg, args)
    dataset = build_dataset(cfg, args)
    loader = EvalLoader(dataset, cfg, max_frames=args.max_eval_frames)
    results = run_inference(cfg, variables, loader)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
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

    out = collect_and_evaluate(cfg, dataset, str(out_dir / 'results'), 0, 1,
                               results, eval_range_m=args.eval_range)
    if out is not None:
        _, means = out
        print({k: round(float(v), 4) for k, v in means.items()})


if __name__ == '__main__':
    main()
