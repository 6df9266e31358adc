#!/usr/bin/env python
"""FPS benchmark CLI (reference: tools/analysis_tools/benchmark.py:29-111 —
5 warmup iterations, timed loop, device-sync bracketed).

python tools/benchmark.py [--iters 300] [--batch 1] [--dtype bfloat16]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=100)
    p.add_argument('--warmup', type=int, default=5)
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--train-step', action='store_true',
                   help='benchmark the training step instead of inference')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from far3d_tpu import Far3D, Far3DConfig, decode_detections, init_state
    from far3d_tpu.utils.synthetic import synthetic_batch

    cfg = Far3DConfig()
    b = args.batch
    dtype = jnp.dtype(args.dtype)

    if args.train_step:
        from far3d_tpu.train.step import create_train_state, make_train_step
        state, tstate = create_train_state(cfg, jax.random.PRNGKey(0), b)
        batch = jax.device_put(synthetic_batch(cfg, batch=b))
        import numpy as np
        step = jax.jit(make_train_step(cfg), donate_argnums=(1,))
        state, tstate, metrics = step(state, tstate, batch,
                                      jax.random.PRNGKey(1))
        # force a host fetch: block_until_ready does not sync on this runtime
        float(np.asarray(metrics['total_loss']))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, tstate, metrics = step(state, tstate, batch,
                                          jax.random.PRNGKey(1))
        float(np.asarray(metrics['total_loss']))
        dt = time.perf_counter() - t0
        print(json.dumps({'metric': 'train_step_per_s',
                          'value': args.iters / dt, 'unit': 'it/s'}))
        return

    model = Far3D(cfg)
    data = synthetic_batch(cfg, batch=b, as_dict=True)
    kwargs = dict(
        images=jnp.asarray(data['images'], dtype),
        lidar2img=jnp.asarray(data['lidar2img']),
        intrinsics=jnp.asarray(data['intrinsics']),
        extrinsics=jnp.asarray(data['extrinsics']),
        prev_exists=jnp.zeros((b,)), timestamp=jnp.zeros((b,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (b, 1, 1)))
    tstate = init_state(b, cfg.head)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), state=tstate,
                                    **kwargs)

    # all inputs are jit ARGUMENTS — closure-captured constants corrupt
    # pallas custom-call programs on this TPU runtime (CLAUDE.md)
    @jax.jit
    def step(variables, tstate, kw):
        out = model.apply(variables, state=tstate, **kw)
        dets = decode_detections(out['all_cls_scores'][-1],
                                 out['all_bbox_preds'][-1],
                                 out['query_valid'], cfg)
        return dets, out['state']

    import numpy as np
    for _ in range(args.warmup):
        dets, tstate = step(variables, tstate, kwargs)
    float(np.asarray(dets['scores']).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        dets, tstate = step(variables, tstate, kwargs)
    float(np.asarray(dets['scores']).ravel()[0])
    dt = time.perf_counter() - t0
    fps = args.iters * b / dt
    print(json.dumps({
        'metric': 'far3d_7cam_960x640_stream_fps', 'value': round(fps, 4),
        'unit': 'frames/s/chip', 'imgs_per_s': round(fps * 7, 2),
        'ms_per_frame': round(1000 * dt / (args.iters * b), 2)}))


if __name__ == '__main__':
    main()
