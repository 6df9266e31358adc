#!/usr/bin/env python
"""Inference-time breakdown on the TPU: times nested prefixes of the forward
graph (backbone+neck | +2D heads | full model) and reports per-segment ms.

Differences between successive prefixes approximate per-stage cost (XLA may
fuse differently per graph, so treat as ~5% accurate).

python tools/dev_profile_breakdown.py [--iters 30]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, args, iters, tag):
    import numpy as np
    out = fn(*args)
    # host fetch = the only reliable sync on this runtime
    float(np.asarray(jax_leaf(out)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax_leaf(out)).ravel()[0])
    ms = 1000 * (time.perf_counter() - t0) / iters
    print(f'{tag:28s} {ms:8.2f} ms')
    return ms


def jax_leaf(tree):
    import jax
    leaves = jax.tree_util.tree_leaves(tree)
    x = leaves[0]
    return x.sum() if hasattr(x, 'sum') else x


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=30)
    args = p.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from far3d_tpu import Far3D, Far3DConfig, init_state
    from far3d_tpu.models.detector import level_shapes
    from far3d_tpu.models.heads2d import YoloxHead2D, select_proposals
    from far3d_tpu.models.vovnet import FPN, VoVNet
    from far3d_tpu.utils.synthetic import synthetic_batch

    cfg = Far3DConfig()
    b = 1
    data = synthetic_batch(cfg, batch=b, as_dict=True)
    dtype = jnp.bfloat16
    images = jnp.asarray(data['images'], dtype)
    bn = b * cfg.data.num_cams
    h, w = cfg.data.input_hw
    x = images.reshape(bn, h, w, 3)

    class BackboneNeck(nn.Module):
        cfg: Far3DConfig

        @nn.compact
        def __call__(self, x):
            stages = VoVNet(self.cfg.backbone, name='backbone')(x)
            return FPN(self.cfg.neck, name='neck')(stages)

    bb = BackboneNeck(cfg)
    vb = jax.jit(bb.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def run_bb(vb, x):
        return [f.sum() for f in bb.apply(vb, x)]

    class BBHeads(nn.Module):
        cfg: Far3DConfig

        @nn.compact
        def __call__(self, x, batch):
            stages = VoVNet(self.cfg.backbone, name='backbone')(x)
            feats = FPN(self.cfg.neck, name='neck')(stages)
            outs2d = YoloxHead2D(self.cfg.roi2d, self.cfg.depthnet,
                                 name='roi_head')(feats, train=False)
            props = select_proposals(outs2d, batch, self.cfg.data.num_cams,
                                     self.cfg.strides,
                                     self.cfg.roi2d.num_proposals_2d,
                                     self.cfg.roi2d.threshold_score)
            return outs2d, props

    bh = BBHeads(cfg)
    vh = jax.jit(bh.init, static_argnums=(2,))(jax.random.PRNGKey(0), x, b)

    @jax.jit
    def run_bh(vh, x):
        outs2d, props = bh.apply(vh, x, b)
        return props['scores'].sum()

    model = Far3D(cfg)
    kwargs = dict(
        images=images,
        lidar2img=jnp.asarray(data['lidar2img']),
        intrinsics=jnp.asarray(data['intrinsics']),
        extrinsics=jnp.asarray(data['extrinsics']),
        prev_exists=jnp.zeros((b,)), timestamp=jnp.zeros((b,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (b, 1, 1)))
    tstate = init_state(b, cfg.head)
    vm = jax.jit(model.init)(jax.random.PRNGKey(0), state=tstate, **kwargs)

    @jax.jit
    def run_full(vm, tstate, kw):
        out = model.apply(vm, state=tstate, **kw)
        return out['all_cls_scores'].sum(), out['state']

    t_bb = timed(run_bb, (vb, x), args.iters, 'backbone+neck')
    t_bh = timed(run_bh, (vh, x), args.iters, '+2d heads & proposals')
    t_fl = timed(lambda vm, ts, kw: run_full(vm, ts, kw)[0],
                 (vm, tstate, kwargs), args.iters, 'full model')
    print(json.dumps({'backbone_neck_ms': round(t_bb, 2),
                      'heads2d_ms': round(t_bh - t_bb, 2),
                      'farhead_ms': round(t_fl - t_bh, 2),
                      'full_ms': round(t_fl, 2)}))


if __name__ == '__main__':
    main()
