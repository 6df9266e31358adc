#!/usr/bin/env python
"""Training-step time decomposition on the TPU.

Times nested subsets of the step so differences isolate components:
  fwd_model  - detector forward in train mode (incl. DN queries, grid mask)
  fwd_loss   - + 3D losses (auction matching) + 2D losses (SimOTA) + DDN
  grad       - + backward
  full_step  - + optimizer/EMA update

python tools/dev_profile_train.py [--iters 10]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from far3d_tpu import Far3DConfig
    from far3d_tpu.models.detector import Far3D, level_shapes
    from far3d_tpu.models.heads2d import make_priors
    from far3d_tpu.ops.grid_mask import grid_mask
    from far3d_tpu.train.dn import build_dn_queries
    from far3d_tpu.train.losses2d import yolox_loss
    from far3d_tpu.train.losses3d import farhead_loss
    from far3d_tpu.train.step import create_train_state, make_train_step
    from far3d_tpu.utils.synthetic import synthetic_batch

    cfg = Far3DConfig()
    model = Far3D(cfg)
    state, tstate = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    batch = jax.device_put(synthetic_batch(cfg, batch=1))
    priors = make_priors(level_shapes(cfg), cfg.strides)
    b, n = 1, cfg.data.num_cams

    # NB: batch/tstate/stats are passed as explicit jit ARGUMENTS below —
    # closure-captured device arrays corrupt pallas custom-call programs on
    # this TPU runtime (CLAUDE.md)
    def prep(batch, rng):
        rng_gm, rng_dn, rng_drop = jax.random.split(rng, 3)
        images = batch.images
        if jnp.issubdtype(images.dtype, jnp.integer):
            mean = jnp.asarray(cfg.data.img_mean, jnp.float32)
            std = jnp.asarray(cfg.data.img_std, jnp.float32)
            images = (images.astype(jnp.float32) - mean) / std
        images = grid_mask(rng_gm, images, cfg.train.grid_mask_prob)
        images = images.astype(jnp.bfloat16)
        dn = build_dn_queries(rng_dn, batch.gt_boxes, batch.gt_labels,
                              batch.gt_mask, cfg.head, cfg.pc_range)
        return images, dn, rng_drop

    def fwd(params, stats, bs, batch, tstate, rng):
        images, dn, rng_drop = prep(batch, rng)
        out, _ = model.apply(
            {'params': params, 'stats': stats, 'batch_stats': bs},
            images=images, lidar2img=batch.lidar2img,
            intrinsics=batch.intrinsics, extrinsics=batch.extrinsics,
            state=tstate, prev_exists=batch.prev_exists,
            timestamp=batch.timestamp, ego_pose=batch.ego_pose,
            ego_pose_inv=batch.ego_pose_inv,
            gt_depth_bins=batch.gt_depth_bins,
            dn_ref_points=dn['ref_points'], dn_valid=dn['valid'],
            use_gt_depth=True, train=True,
            rngs={'dropout': rng_drop}, mutable=['batch_stats'])
        return out, dn

    def loss_of(out, dn, batch):
        losses = farhead_loss(out, batch.gt_boxes, batch.gt_labels,
                              batch.gt_mask, dn, cfg.head)
        losses.update(yolox_loss(
            out['outs2d'], priors,
            batch.gt_boxes2d.reshape(b * n, *batch.gt_boxes2d.shape[2:]),
            batch.gt_labels2d.reshape(b * n, -1),
            batch.gt_centers2d.reshape(b * n, -1, 2),
            batch.gt_mask2d.reshape(b * n, -1),
            batch.gt_depth_bins.reshape(b * n, -1),
            batch.gt_depth_fg.reshape(b * n, -1), cfg.roi2d))
        return sum(jax.tree_util.tree_leaves(losses))

    def f_fwd_model(params, stats, bs, batch, tstate, rng):
        out, _ = fwd(params, stats, bs, batch, tstate, rng)
        return (out['all_cls_scores'].astype(jnp.float32).sum()
                + out['all_bbox_preds'].astype(jnp.float32).sum())

    def f_fwd_loss(params, stats, bs, batch, tstate, rng):
        out, dn = fwd(params, stats, bs, batch, tstate, rng)
        return loss_of(out, dn, batch)

    def f_grad(params, stats, bs, batch, tstate, rng):
        g = jax.grad(f_fwd_loss)(params, stats, bs, batch, tstate, rng)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))

    step = make_train_step(cfg, use_gt_depth=True)

    def f_full(s, ts, batch, rng):
        ns, nts, metrics = step(s, ts, batch, rng)
        # sum a param leaf so the optimizer update isn't dead-code-eliminated
        # (value is a timing probe, not a loss)
        leaf = jax.tree_util.tree_leaves(ns.params)[-1]
        return metrics['total_loss'] + jnp.sum(jnp.abs(leaf))

    def timed(tag, jfn, fargs):
        out = jfn(*fargs)
        float(np.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jfn(*fargs)
        float(np.asarray(out).ravel()[0])
        ms = 1000 * (time.perf_counter() - t0) / args.iters
        print(f'{tag:12s} {ms:8.2f} ms')
        return ms

    rng = jax.random.PRNGKey(7)
    fargs = (state.params, state.stats, state.batch_stats, batch, tstate, rng)
    t1 = timed('fwd_model', jax.jit(f_fwd_model), fargs)
    t2 = timed('fwd_loss', jax.jit(f_fwd_loss), fargs)
    t3 = timed('grad', jax.jit(f_grad), fargs)
    t4 = timed('full_step', jax.jit(f_full), (state, tstate, batch, rng))
    print(f'-> losses+matching ~{t2 - t1:.1f} ms, backward ~{t3 - t2:.1f} ms,'
          f' optimizer/EMA ~{t4 - t3:.1f} ms')


if __name__ == '__main__':
    main()
