#!/usr/bin/env python
"""Deformable-attention visualization (reference: tools/visual/vis_attention.py
— overlay per-query sampling points, sized/colored by attention weight, on the
camera images).

Runs the detector with flax intermediates captured (the DeformableAggregation
modules sow their sampling locations + softmax weights), picks the top-scoring
decoded queries, and draws each decoder layer's sampling points for those
queries. Point color encodes the camera-softmax weight (sum over groups/levels).

python tools/vis_attention.py --data-root data/av2 --checkpoint work_dirs/far3d \
    --num-queries 8 --layer -1
"""

import argparse
import dataclasses
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()

from _common import add_common_args, build_dataset, load_variables  # noqa


def main():
    p = add_common_args(argparse.ArgumentParser())
    p.add_argument('--num-queries', type=int, default=8)
    p.add_argument('--layer', type=int, default=-1,
                   help='decoder layer to visualize (default: last)')
    p.add_argument('--score-thr', type=float, default=0.2)
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from far3d_tpu import Far3D, decode_detections
    from far3d_tpu.config import Far3DConfig
    from far3d_tpu.data.loader import EvalLoader
    from far3d_tpu.models.farhead import init_state
    from far3d_tpu.utils.vis import denormalize_image, draw_points

    cfg = Far3DConfig()
    # remat drops sown intermediates; turn it off for observability
    cfg = cfg.replace(decoder=dataclasses.replace(cfg.decoder, remat=False))
    variables = load_variables(cfg, args)
    dataset = build_dataset(cfg, args)
    model = Far3D(cfg)

    @jax.jit
    def forward(variables, tstate, kw):
        out, mods = model.apply(variables, state=tstate, mutable=['intermediates'],
                                **kw)
        dets = decode_detections(out['all_cls_scores'][-1],
                                 out['all_bbox_preds'][-1],
                                 out['query_valid'], cfg)
        return dets, out['state'], mods['intermediates']

    tstate = init_state(1, cfg.head)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    pad_h, pad_w = cfg.data.input_hw
    layer = args.layer % cfg.decoder.num_layers
    loader = EvalLoader(dataset, cfg, max_frames=args.num_frames)
    for k, frame in enumerate(loader):
        batch = {key: jnp.asarray(v)[None] for key, v in frame.items()
                 if key in ('images', 'lidar2img', 'intrinsics', 'extrinsics',
                            'timestamp', 'prev_exists', 'ego_pose',
                            'ego_pose_inv')}
        dets, tstate, inter = forward(variables, tstate, batch)
        agg = inter['pts_head']['decoder'][f'layer{layer}']['cross_attn']
        loc = np.asarray(agg['sampling_loc'][0])   # (N, Q, P, 2) in [0,1]
        w = np.asarray(agg['attn_weights'][0])     # (N, Q, G, L, P)
        n_cams, q_total = loc.shape[0], loc.shape[1]
        # per-point weight summed over groups & levels -> (N, Q, P)
        wp = w.sum(axis=(2, 3))

        # the decode maps flat (query x class) indices back to query ids
        scores = np.asarray(dets['scores'][0])
        keep = (scores > args.score_thr) & np.asarray(dets['valid'][0])
        order = np.argsort(-scores)[:args.num_queries]
        order = order[keep[order]]
        qidx = np.asarray(dets['query_idx'][0])
        for ci in range(n_cams):
            img = np.ascontiguousarray(denormalize_image(
                frame['images'][ci], cfg.data.img_mean, cfg.data.img_std))
            for di in order:
                qi = int(qidx[di])
                uv = loc[ci, qi] * np.asarray([pad_w, pad_h])
                wq = wp[ci, qi]
                wq = wq / max(float(wq.max()), 1e-6)
                colors = (np.stack([
                    np.full_like(wq, 60), 255 * (1 - wq), 255 * wq],
                    axis=-1)).astype(np.uint8)
                draw_points(img, uv, colors=colors, radius=3)
            cv2.imwrite(str(out_dir / f'attn_f{k:04d}_l{layer}_cam{ci}.jpg'),
                        img)
        print(f'frame {k}: drew {len(order)} queries x {loc.shape[2]} points '
              f'x {n_cams} cams (layer {layer})')


if __name__ == '__main__':
    main()
