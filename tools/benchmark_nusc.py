#!/usr/bin/env python
"""StreamPETR (second model family) device-only streaming FPS benchmark.

Same protocol as tools/benchmark.py (reference:
tools/analysis_tools/benchmark.py:29-111 — warmup, timed loop, device-sync
bracketed): 6-camera 320x800 nuScenes-style frames through the full
StreamPETR model (VoVNet -> FPN -> dense PETR temporal decoder, reference
petr_transformer.py:411-741) plus the NMS-free decode.

python tools/benchmark_nusc.py [--iters 30] [--quant] [--set KEY=VAL ...]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=30)
    p.add_argument('--warmup', type=int, default=5)
    p.add_argument('--quant', action='store_true',
                   help='int8 PTQ backbone serving mode '
                        '(ops/quant.py:quantize_petr_backbone)')
    p.add_argument('--set', action='append', default=[], metavar='KEY=VAL',
                   dest='overrides', help='dotted StreamPETRConfig overrides')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from far3d_tpu.config import apply_overrides
    from far3d_tpu.models.detector import decode_boxes
    from far3d_tpu.models.streampetr import (StreamPETR, StreamPETRConfig,
                                             init_petr_state)
    from far3d_tpu.utils.backend import wait_for_backend
    wait_for_backend()

    cfg = apply_overrides(StreamPETRConfig(), args.overrides)
    model = StreamPETR(cfg)
    b = 1
    h, w = cfg.input_hw
    rng = np.random.RandomState(0)
    # standard-normal floats = the post-normalize image domain
    images = jnp.asarray(rng.randn(b, cfg.num_cams, h, w, 3), jnp.bfloat16)
    intr = np.array([[800.0, 0, w / 2, 0], [0, 800.0, h / 2, 0],
                     [0, 0, 1, 0], [0, 0, 0, 1]])
    kwargs = dict(
        images=images,
        lidar2img=jnp.asarray(np.tile(intr[None, None], (b, cfg.num_cams, 1, 1)),
                              jnp.float32),
        prev_exists=jnp.zeros((b,)),
        timestamp=jnp.zeros((b,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
    )
    tstate = init_petr_state(b, cfg)
    print('# compiling model.init ...', file=sys.stderr, flush=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), state=tstate,
                                    **kwargs)

    quant_tree = None
    if args.quant:
        from far3d_tpu.ops.quant import quantize_petr_backbone
        print('# calibrating int8 backbone ...', file=sys.stderr, flush=True)
        quant_tree = quantize_petr_backbone(cfg, variables,
                                            [kwargs['images']])
        print('# calibration done', file=sys.stderr, flush=True)

    # all inputs are jit ARGUMENTS — closure-captured constants corrupt
    # pallas custom-call programs on this TPU runtime (CLAUDE.md)
    @jax.jit
    def step(variables, tstate, kw, quant_tree):
        out = model.apply(variables, state=tstate, quant_backbone=quant_tree,
                          **kw)
        dets = decode_boxes(out['all_cls_scores'][-1],
                            out['all_bbox_preds'][-1],
                            out['query_valid'], cfg.max_decode_num,
                            cfg.post_center_range)
        return dets, out['state']

    print('# compiling + warming the step ...', file=sys.stderr, flush=True)
    for _ in range(args.warmup):
        dets, tstate = step(variables, tstate, kwargs, quant_tree)
    # jax.block_until_ready does not sync on this TPU runtime — host fetch
    float(np.asarray(dets['scores']).ravel()[0])
    print('# timing ...', file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        dets, tstate = step(variables, tstate, kwargs, quant_tree)
    float(np.asarray(dets['scores']).ravel()[0])
    dt = time.perf_counter() - t0
    fps = args.iters * b / dt
    print(json.dumps({
        'metric': 'streampetr_6cam_320x800_stream_fps'
                  + ('_int8' if args.quant else ''),
        'value': round(fps, 4),
        'unit': 'frames/s/chip',
        'imgs_per_s': round(fps * cfg.num_cams, 2),
        'ms_per_frame': round(1000 * dt / (args.iters * b), 2)}))


if __name__ == '__main__':
    main()
