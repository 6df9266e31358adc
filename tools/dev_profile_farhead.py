#!/usr/bin/env python
"""FarHead cost dissection on the TPU: time the full model at decoder depths
0/1/3/6 — the slope is the per-decoder-layer cost (self-attn + MSDA wrapper +
kernel + FFN), the intercept is backbone + 2D heads + query lift + memory.

Also times the msda op (kernel + XLA wrapper) standalone at inference shapes.

python tools/dev_profile_farhead.py [--iters 30]
"""

import argparse
import dataclasses
import json
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
    from far3d_tpu import Far3D, Far3DConfig, init_state
    from far3d_tpu.utils.synthetic import synthetic_batch

    base = Far3DConfig()
    data = synthetic_batch(base, batch=1, as_dict=True)
    kwargs = dict(
        images=jnp.asarray(data['images'], jnp.bfloat16),
        lidar2img=jnp.asarray(data['lidar2img']),
        intrinsics=jnp.asarray(data['intrinsics']),
        extrinsics=jnp.asarray(data['extrinsics']),
        prev_exists=jnp.zeros((1,)), timestamp=jnp.zeros((1,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (1, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (1, 1, 1)))

    results = {}
    for nl in (1, 3, 6):
        cfg = base.replace(decoder=dataclasses.replace(base.decoder,
                                                       num_layers=nl))
        model = Far3D(cfg)
        tstate = init_state(1, cfg.head)
        v = jax.jit(model.init)(jax.random.PRNGKey(0), state=tstate, **kwargs)

        @jax.jit
        def run(v, tstate, kw, model=model):
            out = model.apply(v, state=tstate, **kw)
            return out['all_cls_scores'].sum()

        out = run(v, tstate, kwargs)
        float(np.asarray(out))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run(v, tstate, kwargs)
        float(np.asarray(out))
        ms = 1000 * (time.perf_counter() - t0) / args.iters
        results[nl] = ms
        print(f'decoder layers {nl}: {ms:7.2f} ms')

    per_layer = (results[6] - results[1]) / 5
    print(json.dumps({'per_decoder_layer_ms': round(per_layer, 2),
                      'non_decoder_ms': round(results[1] - per_layer, 2),
                      **{f'nl{k}_ms': round(v, 2)
                         for k, v in results.items()}}))

    # --- msda op standalone at inference geometry ---
    from far3d_tpu.models.detector import level_shapes
    from far3d_tpu.ops.msda import msda
    cfg = base
    shapes = level_shapes(cfg)
    l_total = sum(h * w for h, w in shapes)
    bn, q = 7, 1160
    g, p = cfg.deform.num_groups, cfg.deform.num_pts
    c = cfg.deform.embed_dims
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.rand(bn, l_total, c), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(bn, q, p, 2) * 1.2 - 0.1, jnp.float32)
    w = jax.nn.softmax(jnp.asarray(
        rng.rand(bn, q, g, len(shapes), p), jnp.float32), axis=(-1,))

    @jax.jit
    def run_msda(value, loc, w):
        return msda(value, shapes, loc, w, use_pallas=True).sum()

    out = run_msda(value, loc, w)
    float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run_msda(value, loc, w)
    float(np.asarray(out))
    ms = 1000 * (time.perf_counter() - t0) / args.iters
    print(f'msda op standalone (incl. dispatch): {ms:7.2f} ms')


if __name__ == '__main__':
    main()
