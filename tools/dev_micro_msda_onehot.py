#!/usr/bin/env python
"""Bounded experiment: one-hot construction variants in the MSDA fwd kernel
(docs/PROFILE.md "MSDA one-hot VPU bound"). Measures the shipped
cast+multiply corner loop ('castmul', 4 VPU ops/corner) against an f32
select formulation ('select', 3 ops/corner) at real inference geometry,
with an XLA-oracle correctness gate before timing each mode.

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
    n, q = cfg.data.num_cams, 1160
    g, pnum = cfg.deform.num_groups, cfg.deform.num_pts
    c = cfg.deform.embed_dims
    pc = np.asarray(cfg.pc_range)
    rng = np.random.RandomState(0)
    data = synthetic_batch(cfg, batch=1, as_dict=True)
    l2i = jnp.asarray(data['lidar2img'])

    pts = rng.rand(1, q, pnum, 3) * (pc[3:] - pc[:3]) + pc[:3]
    uv, _ = project_to_image(jnp.asarray(pts)[:, None],
                             l2i[:, :, None, None])
    pad_h, pad_w = cfg.data.input_hw
    loc = jnp.asarray((uv / jnp.asarray([pad_w, pad_h])
                       ).reshape(n, q, pnum, 2), jnp.float32)
    value = jnp.asarray(rng.rand(n, l_total, c), jnp.bfloat16)
    w = jax.nn.softmax(jnp.asarray(
        rng.rand(n, q, g, len(shapes), pnum), jnp.float32)
        .reshape(n, q, g, -1), axis=-1).reshape(n, q, g, len(shapes), pnum)

    ref = np.asarray(jax.jit(
        lambda v, l, w_: msda_xla(v, shapes, l, w_))(value, loc, w),
        np.float32)

    def run_mode(mode):
        msda_pallas.SEL_MODE = mode
        msda_pallas._clear_kernel_caches()

        # fresh jit per mode (the pallas_call builders are re-traced)
        def f(v, l, w_):
            return msda_pallas._forward(v, shapes, l, w_)
        jf = jax.jit(f)
        out = jf(value, loc, w)
        err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
        scale = float(np.max(np.abs(ref)))
        print(f'{mode:8s} max |err| vs XLA oracle: {err:.5f} '
              f'(scale {scale:.2f})')
        assert err < 0.05 * scale, f'{mode} numerics off'
        # chained timing, host-fetch of a reduced scalar (CLAUDE.md:
        # block_until_ready does not sync on axon)
        jsum = jax.jit(lambda v, l, w_: f(v, l, w_).astype(jnp.float32).sum())
        float(np.asarray(jsum(value, loc, w)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = jsum(value, loc, w)
        float(np.asarray(s))
        ms = 1000 * (time.perf_counter() - t0) / args.iters
        print(f'{mode:8s} fwd: {ms:7.3f} ms')
        return ms

    base = run_mode('castmul')
    try:
        sel = run_mode('select')
        print(f'select/castmul: {sel / base:.3f}x')
    finally:
        msda_pallas.SEL_MODE = 'castmul'
        msda_pallas._clear_kernel_caches()


if __name__ == '__main__':
    main()
