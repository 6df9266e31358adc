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

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()


from far3d_tpu.utils.vis import draw_bev, draw_boxes_camera  # noqa: E402


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
