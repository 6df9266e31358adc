#!/usr/bin/env python
"""MSDA cost split at realistic geometry: pallas kernel vs XLA wrapper
(_Prep sort/corner-data/gathers) vs the full DeformableAggregation module.

Realistic sampling locations: random pc-range points projected through the
synthetic camera rig (a 3D key point lands in ~2 of 7 cameras), which is what
the kernel's validity sort exploits in the real model.

python tools/dev_profile_msda.py [--iters 30]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from far3d_tpu import Far3DConfig
    from far3d_tpu.geometry import project_to_image
    from far3d_tpu.models.detector import level_shapes
    from far3d_tpu.ops.msda import msda
    from far3d_tpu.ops.msda_pallas import _Prep
    from far3d_tpu.utils.synthetic import synthetic_batch

    cfg = Far3DConfig()
    shapes = level_shapes(cfg)
    l_total = sum(h * w for h, w in shapes)
    n, q = cfg.data.num_cams, 1160
    g, pnum = cfg.deform.num_groups, cfg.deform.num_pts
    c = cfg.deform.embed_dims
    pc = np.asarray(cfg.pc_range)
    rng = np.random.RandomState(0)
    data = synthetic_batch(cfg, batch=1, as_dict=True)
    l2i = jnp.asarray(data['lidar2img'])            # (1, N, 4, 4)

    pts = rng.rand(1, q, pnum, 3) * (pc[3:] - pc[:3]) + pc[:3]
    uv, _ = project_to_image(jnp.asarray(pts)[:, None],
                             l2i[:, :, None, None])
    pad_h, pad_w = cfg.data.input_hw
    loc = (uv / jnp.asarray([pad_w, pad_h])).reshape(n, q, pnum, 2)
    loc = jnp.asarray(loc, jnp.float32)
    inb = ((loc > 0) & (loc < 1)).all(-1)
    print(f'valid point fraction: {float(inb.mean()):.3f}')

    value = jnp.asarray(rng.rand(n, l_total, c), jnp.bfloat16)
    w = jax.nn.softmax(jnp.asarray(
        rng.rand(n, q, g, len(shapes), pnum), jnp.float32)
        .reshape(n, q, g, -1), axis=-1).reshape(n, q, g, len(shapes), pnum)

    def timed(tag, fn, fargs):
        jfn = jax.jit(fn)
        out = jfn(*fargs)
        float(np.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jfn(*fargs)
        float(np.asarray(out).ravel()[0])
        ms = 1000 * (time.perf_counter() - t0) / args.iters
        print(f'{tag:40s} {ms:7.2f} ms')
        return ms

    timed('msda pallas (kernel + wrapper)',
          lambda v, l, w_: msda(v, shapes, l, w_, use_pallas=True).sum(),
          (value, loc, w))

    def prep_only(l, w_):
        # v2 kernels compute corner data in-kernel; _Prep is just the sort,
        # row padding, and chunk-range tables
        pr = _Prep(shapes, l, w_)
        s = pr.loc_rows.sum() + pr.qorder.sum()
        s += sum(x.sum() for x in pr.wa_segs)
        s += sum(x.sum() for x in pr.rng_segs)
        return s

    timed('_Prep only (sort + ranges)', prep_only, (loc, w))

    # wrapper total = msda - kernel; estimate kernel via a second msda call
    # on presorted inputs? Instead time 2x chained msda to check per-op cost
    def msda_x2(v, l, w_):
        a = msda(v, shapes, l, w_, use_pallas=True)
        b = msda(v, shapes, l + 1e-4, w_, use_pallas=True)
        return a.sum() + b.sum()

    timed('msda x2 (chained)', msda_x2, (value, loc, w))


if __name__ == '__main__':
    main()
