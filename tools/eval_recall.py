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

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()


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


def synthetic_recall_curve(ks=(64, 128, 192, 256, 384, 512), n_frames=20,
                           gt_per_frame=280, fp_ratio=2.0, seed=0,
                           threshold=0.1):
    """Recall-vs-K curve of the static top-K proposal selection on synthetic
    dense scenes (no trained head needed): GT peaks (score U(0.3, 1)) and
    `fp_ratio`x false-positive peaks (score U(0.1, 0.4)) are painted onto
    full-resolution 7-camera score maps, then routed through the real
    `select_proposals`. Measures how often score-ordered top-K clips GT peaks
    — the failure mode that replacing the reference's unbounded threshold
    filter (yolox_head.py:437-458) with a fixed budget could introduce.
    """
    import jax.numpy as jnp
    from far3d_tpu.config import Far3DConfig
    from far3d_tpu.models.heads2d import select_proposals

    cfg = Far3DConfig()
    h, w = cfg.data.input_hw
    level_hw = [(h // s, w // s) for s in cfg.strides]
    n_cams = cfg.data.num_cams
    rng = np.random.default_rng(seed)
    results = {k: [0, 0] for k in ks}
    for _ in range(n_frames):
        cls = [np.full((n_cams,) + hw + (1,), -20.0, np.float32)
               for hw in level_hw]
        obj = [np.full((n_cams,) + hw + (1,), 20.0, np.float32)
               for hw in level_hw]
        bbox = [np.zeros((n_cams,) + hw + (4,), np.float32)
                for hw in level_hw]
        gt_flat = []          # (cam, level, y, x) of GT peaks

        def paint(n, lo, hi, record):
            for _ in range(n):
                ci = int(rng.integers(n_cams))
                li = int(rng.integers(len(level_hw)))
                hh, ww = level_hw[li]
                yy = int(rng.integers(1, hh - 1))
                xx = int(rng.integers(1, ww - 1))
                s = float(rng.uniform(lo, hi))
                # logit of the target sigmoid score (obj is saturated at 1)
                cls[li][ci, yy, xx, 0] = float(np.log(s / (1 - s)))
                if record:
                    gt_flat.append((ci, li, yy, xx))

        paint(gt_per_frame, 0.3, 0.99, True)
        paint(int(gt_per_frame * fp_ratio), threshold + 0.01, 0.4, False)

        outs = {
            'cls_scores': [jnp.asarray(c) for c in cls],
            'objectnesses': [jnp.asarray(o) for o in obj],
            'bbox_preds': [jnp.asarray(bb) for bb in bbox],
        }
        offs = np.cumsum([0] + [hh * ww for hh, ww in level_hw])
        gt_idx = {ci: set() for ci in range(n_cams)}
        for ci, li, yy, xx in gt_flat:
            gt_idx[ci].add(int(offs[li] + yy * level_hw[li][1] + xx))
        for k in ks:
            sel = select_proposals(outs, 1, n_cams, cfg.strides, k, threshold)
            cam = np.asarray(sel['cam_idx'][0])
            flat = np.asarray(sel['flat_idx'][0])
            valid = np.asarray(sel['valid'][0])
            hit = sum(1 for c, f, v in zip(cam, flat, valid)
                      if v and int(f) in gt_idx[int(c)])
            results[k][0] += hit
            results[k][1] += len(gt_flat)
    print(f'# synthetic dense scenes: {gt_per_frame} GT peaks/frame, '
          f'{fp_ratio}x false positives, {n_frames} frames')
    for k in ks:
        hit, tot = results[k]
        print(f'K={k:>4}: GT-peak recall {hit / tot:.4f} ({hit}/{tot})')
    return {k: results[k][0] / results[k][1] for k in ks}


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--synthetic', action='store_true',
                   help='recall-vs-K curve on synthetic dense scenes '
                        '(no data/checkpoint needed)')
    p.add_argument('--gt-per-frame', type=int, default=280)
    p.add_argument('--data-root', default=None)
    p.add_argument('--ann-file', default=None)
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--num-frames', type=int, default=100)
    p.add_argument('--iou-thr', type=float, default=0.5)
    args = p.parse_args()

    if args.synthetic:
        synthetic_recall_curve(gt_per_frame=args.gt_per_frame)
        return
    if args.data_root is None:
        p.error('--data-root is required unless --synthetic')

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
