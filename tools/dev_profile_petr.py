#!/usr/bin/env python
"""StreamPETR frame-cost decomposition on the TPU.

Times (a) backbone+FPN alone, (b) the full model at num_layers = 1 and 6.
The layer slope gives per-decoder-layer cost; the num_layers=1 intercept
minus (a) gives the PE + projections + memory + branch overhead. Same
host-fetch-synced methodology as tools/dev_profile_breakdown.py.

python tools/dev_profile_petr.py [--iters 30]
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()


def timed(fn, args, iters, tag):
    import numpy as np
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    ms = 1000 * (time.perf_counter() - t0) / iters
    print(f'{tag:28s} {ms:8.2f} ms', flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=30)
    args = p.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    from far3d_tpu.models.streampetr import (StreamPETR, StreamPETRConfig,
                                             init_petr_state)
    from far3d_tpu.models.vovnet import FPN, VoVNet

    cfg = StreamPETRConfig()
    b = 1
    h, w = cfg.input_hw
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(b, cfg.num_cams, h, w, 3), jnp.bfloat16)
    intr = np.array([[800.0, 0, w / 2, 0], [0, 800.0, h / 2, 0],
                     [0, 0, 1, 0], [0, 0, 0, 1]])
    kwargs = dict(
        images=images,
        lidar2img=jnp.asarray(np.tile(intr[None, None],
                                      (b, cfg.num_cams, 1, 1)), jnp.float32),
        prev_exists=jnp.zeros((b,)),
        timestamp=jnp.zeros((b,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
    )

    class BackboneNeck(nn.Module):
        cfg: StreamPETRConfig

        @nn.compact
        def __call__(self, x):
            stages = VoVNet(self.cfg.backbone, name='backbone')(x)
            return FPN(self.cfg.neck, name='neck')(stages)

    x = images.reshape(b * cfg.num_cams, h, w, 3)
    bb = BackboneNeck(cfg)
    vb = jax.jit(bb.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def run_bb(vb, x):
        return sum(f.sum() for f in bb.apply(vb, x)).astype(jnp.float32)

    t_bb = timed(run_bb, (vb, x), args.iters, 'backbone+neck')

    results = {'backbone_neck_ms': round(t_bb, 2)}
    per_layers = {}
    for nl in (1, 6):
        c = dataclasses.replace(cfg, num_layers=nl)
        model = StreamPETR(c)
        tstate = init_petr_state(b, c)
        vm = jax.jit(model.init)(jax.random.PRNGKey(0), state=tstate,
                                 **kwargs)

        @jax.jit
        def run_full(vm, tstate, kw):
            out = model.apply(vm, state=tstate, **kw)
            return out['all_cls_scores'].sum()

        per_layers[nl] = timed(run_full, (vm, tstate, kwargs), args.iters,
                               f'full model (layers={nl})')

    slope = (per_layers[6] - per_layers[1]) / 5.0
    head_fixed = per_layers[1] - slope - t_bb
    results.update({
        'full_6layer_ms': round(per_layers[6], 2),
        'full_1layer_ms': round(per_layers[1], 2),
        'per_decoder_layer_ms': round(slope, 2),
        'head_fixed_ms': round(head_fixed, 2),
    })
    print(json.dumps(results))


if __name__ == '__main__':
    main()
