#!/usr/bin/env python
"""Depth statistics (reference: tools/visual/vis_3dpred_depth_stat.py /
vis_3dpred_depth_stat2.py — binned range error of 3D predictions and of the
depth branch vs GT).

Produces:
  * range-binned |range error| of matched 3D predictions (pred vs nearest GT)
  * the DepthPredictor's expected-depth error on painted foreground pixels
  * matplotlib histograms + one stats JSON in --out-dir

python tools/vis_depth_stats.py --data-root data/av2 --checkpoint work_dirs/f
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()

from _common import add_common_args, build_dataset, load_variables  # noqa


def main():
    p = add_common_args(argparse.ArgumentParser())
    p.add_argument('--score-thr', type=float, default=0.2)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from far3d_tpu import Far3D, decode_detections
    from far3d_tpu.config import Far3DConfig
    from far3d_tpu.data.loader import EvalLoader
    from far3d_tpu.models.farhead import init_state
    from far3d_tpu.geometry import lid_bin_to_depth

    cfg = Far3DConfig()
    variables = load_variables(cfg, args)
    dataset = build_dataset(cfg, args)
    model = Far3D(cfg)
    dn = cfg.depthnet
    centers = np.asarray(lid_bin_to_depth(
        jnp.arange(dn.num_depth_bins) + 0.5, dn.depth_min, dn.depth_max,
        dn.num_depth_bins))

    @jax.jit
    def forward(variables, tstate, kw):
        out = model.apply(variables, state=tstate, **kw)
        dets = decode_detections(out['all_cls_scores'][-1],
                                 out['all_bbox_preds'][-1],
                                 out['query_valid'], cfg)
        dl = out['outs2d']['depth_logit']
        probs = jax.nn.softmax(dl[..., :cfg.depthnet.num_depth_bins], -1)
        exp_depth = probs @ jnp.asarray(centers)
        return dets, out['state'], exp_depth

    tstate = init_state(1, cfg.head)
    range_err, range_gt = [], []
    px_err, px_gt = [], []
    loader = EvalLoader(dataset, cfg, max_frames=args.num_frames)
    for frame in loader:
        batch = {key: jnp.asarray(v)[None] for key, v in frame.items()
                 if key in ('images', 'lidar2img', 'intrinsics', 'extrinsics',
                            'timestamp', 'prev_exists', 'ego_pose',
                            'ego_pose_inv')}
        dets, tstate, exp_depth = forward(variables, tstate, batch)
        rec = dataset.get_frame(frame['index'])
        gt = rec.get('gt_boxes_3d', np.zeros((0, 7)))
        keep = np.asarray(dets['valid'][0]) & (
            np.asarray(dets['scores'][0]) > args.score_thr)
        pred = np.asarray(dets['boxes'][0])[keep]
        if len(gt) and len(pred):
            # nearest-GT match in BEV; record range error of the match
            d = np.linalg.norm(pred[:, None, :2] - gt[None, :, :2], axis=-1)
            j = d.argmin(1)
            ok = d[np.arange(len(pred)), j] < 4.0
            pr = np.linalg.norm(pred[ok, :2], axis=-1)
            gr = np.linalg.norm(gt[j[ok], :2], axis=-1)
            range_err.extend(np.abs(pr - gr))
            range_gt.extend(gr)
        # depth-branch error on painted fg pixels
        if 'gt_depth_bins' in frame:
            fg = frame['gt_depth_fg'].reshape(-1)
            if fg.any():
                bins = frame['gt_depth_bins'].reshape(-1)[fg]
                bins = np.clip(bins, 0, len(centers) - 1)
                gd = centers[bins]
                pd_ = np.asarray(exp_depth).reshape(-1)[fg]
                px_err.extend(np.abs(pd_ - gd))
                px_gt.extend(gd)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    edges = np.array([0, 20, 40, 60, 80, 100, 120, 150])
    stats = {}
    for name, err, ref in (('pred_range', range_err, range_gt),
                           ('depth_branch', px_err, px_gt)):
        err, ref = np.asarray(err), np.asarray(ref)
        rows = []
        for lo, hi in zip(edges[:-1], edges[1:]):
            m = (ref >= lo) & (ref < hi)
            rows.append(dict(range=[int(lo), int(hi)], n=int(m.sum()),
                             mae=float(err[m].mean()) if m.any() else None))
        stats[name] = rows
        if len(err):
            fig, ax = plt.subplots(figsize=(6, 4))
            ax.hist(err, bins=50)
            ax.set_xlabel('|depth error| (m)')
            ax.set_title(f'{name}: n={len(err)} mae={err.mean():.2f}m')
            fig.savefig(out_dir / f'depth_stat_{name}.png', dpi=120)
            plt.close(fig)
    with open(out_dir / 'depth_stats.json', 'w') as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats, indent=2))


if __name__ == '__main__':
    main()
