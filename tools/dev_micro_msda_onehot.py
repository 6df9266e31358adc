#!/usr/bin/env python
"""MSDA forward-kernel micro: XLA-oracle correctness gate + chained timing at
inference (q=1160) and training (q=1616, DN + proposals) query counts.

History (docs/PROFILE.md "MSDA one-hot VPU bound"): this tool settled the
one-hot construction experiment — the f32 select-accumulate form
(3 VPU ops/corner) measured 7.990 ms vs 8.632 ms for the cast+multiply form
(4 ops/corner) at inference geometry (uniform-random benchmark locations),
so 'select' shipped and 'castmul' was deleted (round 5). It remains the
harness for fwd-kernel experiments (e.g. row-block skipping) and a
training-shape compile canary for the f32 staging buffer's scoped-VMEM
footprint (13.43 ms at q_pad 1616, fits the 16 MB scope).

python tools/dev_micro_msda_onehot.py [--iters 30]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()


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
    from far3d_tpu.ops import msda_pallas
    from far3d_tpu.ops.msda import msda_xla
    from far3d_tpu.utils.synthetic import synthetic_batch

    cfg = Far3DConfig()
    shapes = level_shapes(cfg)
    l_total = sum(h * w for h, w in shapes)
    n = cfg.data.num_cams
    g, pnum = cfg.deform.num_groups, cfg.deform.num_pts
    c = cfg.deform.embed_dims
    pc = np.asarray(cfg.pc_range)
    rng = np.random.RandomState(0)
    data = synthetic_batch(cfg, batch=1, as_dict=True)
    l2i = jnp.asarray(data['lidar2img'])
    pad_h, pad_w = cfg.data.input_hw

    def run_q(q, label):
        pts = rng.rand(1, q, pnum, 3) * (pc[3:] - pc[:3]) + pc[:3]
        uv, _ = project_to_image(jnp.asarray(pts)[:, None],
                                 l2i[:, :, None, None])
        loc = jnp.asarray((uv / jnp.asarray([pad_w, pad_h])
                           ).reshape(n, q, pnum, 2), jnp.float32)
        value = jnp.asarray(rng.rand(n, l_total, c), jnp.bfloat16)
        w = jax.nn.softmax(jnp.asarray(
            rng.rand(n, q, g, len(shapes), pnum), jnp.float32)
            .reshape(n, q, g, -1), axis=-1).reshape(n, q, g, len(shapes),
                                                    pnum)

        ref = np.asarray(jax.jit(
            lambda v, l, w_: msda_xla(v, shapes, l, w_))(value, loc, w),
            np.float32)

        def f(v, l, w_):
            return msda_pallas._forward(v, shapes, l, w_)
        out = jax.jit(f)(value, loc, w)
        err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
        scale = float(np.max(np.abs(ref)))
        print(f'{label:12s} max |err| vs XLA oracle: {err:.5f} '
              f'(scale {scale:.2f})')
        assert err < 0.05 * scale, f'{label} numerics off'
        # chained timing, host-fetch of a reduced scalar (CLAUDE.md:
        # block_until_ready does not sync on axon)
        jsum = jax.jit(lambda v, l, w_: f(v, l, w_).astype(jnp.float32).sum())
        float(np.asarray(jsum(value, loc, w)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = jsum(value, loc, w)
        float(np.asarray(s))
        ms = 1000 * (time.perf_counter() - t0) / args.iters
        print(f'{label:12s} fwd: {ms:7.3f} ms')
        return ms

    run_q(1160, 'infer-q1160')
    run_q(1616, 'train-q1616')


if __name__ == '__main__':
    main()
