#!/usr/bin/env python
"""2D proposal recall probe (reference: datasets/eval_recall.py:86-150):
measures how many GT 2D boxes the YOLOX proposal stage recovers, bucketed by
GT depth range — the diagnostic used to tune the 2D-prior branch.

python tools/eval_recall.py --data-root data/av2 --checkpoint work_dirs/far3d
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def iou_xyxy(a, b):
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-root', required=True)
    p.add_argument('--ann-file', default=None)
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--num-frames', type=int, default=100)
    p.add_argument('--iou-thr', type=float, default=0.5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from far3d_tpu.config import Far3DConfig
    from far3d_tpu.data.av2_dataset import AV2SequenceDataset
    from far3d_tpu.data.loader import EvalLoader
    from far3d_tpu.models.detector import Far3D
    from far3d_tpu.models.farhead import init_state
    from far3d_tpu.train.step import create_train_state
    from far3d_tpu.utils.checkpoint import CheckpointManager

    cfg = Far3DConfig()
    ann = args.ann_file or f'{args.data_root}/av2_val_infos.pkl'
    dataset = AV2SequenceDataset(ann, args.data_root, split='val',
                                 test_mode=False, seq_split_num=1)
    state, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    mgr = CheckpointManager(args.checkpoint)
    state = mgr.restore(state)
    variables = {'params': state.params, 'stats': state.stats,
                 'batch_stats': state.batch_stats}
    model = Far3D(cfg)

    @jax.jit
    def forward(variables, tstate, batch):
        out = model.apply(variables, state=tstate, train=False, **batch)
        return out['proposals'], out['state']

    buckets = [(0, 30), (30, 75), (75, 150)]
    hits = {b: 0 for b in buckets}
    total = {b: 0 for b in buckets}
    tstate = init_state(1, cfg.head)
    loader = EvalLoader(dataset, cfg)
    for fi, frame in enumerate(loader):
        if fi >= args.num_frames:
            break
        rec = dataset.get_frame(frame['index'])
        batch = {k: jnp.asarray(v)[None] for k, v in frame.items()
                 if k in ('images', 'lidar2img', 'intrinsics', 'extrinsics',
                          'timestamp', 'prev_exists', 'ego_pose',
                          'ego_pose_inv')}
        props, tstate = forward(variables, tstate, batch)
        boxes = np.asarray(props['boxes'][0])          # cxcywh
        cam = np.asarray(props['cam_idx'][0])
        valid = np.asarray(props['valid'][0])
        xyxy = np.concatenate([boxes[:, :2] - boxes[:, 2:] / 2,
                               boxes[:, :2] + boxes[:, 2:] / 2], axis=1)
        for ci in range(cfg.data.num_cams):
            gt = rec['gt_bboxes_2d'][ci]
            gd = rec['gt_depths_2d'][ci]
            pred = xyxy[(cam == ci) & valid]
            ious = iou_xyxy(gt, pred)
            matched = ious.max(axis=1) >= args.iou_thr if len(pred) else \
                np.zeros(len(gt), bool)
            for b in buckets:
                sel = (gd >= b[0]) & (gd < b[1])
                total[b] += int(sel.sum())
                hits[b] += int((matched & sel).sum())
    for b in buckets:
        r = hits[b] / max(total[b], 1)
        print(f'range {b[0]:>3.0f}-{b[1]:>3.0f} m: recall {r:.4f} '
              f'({hits[b]}/{total[b]})')


if __name__ == '__main__':
    main()
