"""Benchmark: 7-camera 960x640 streaming inference frames/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference runs 6.4 img/s = 0.914 seven-camera frames/s on GPU
(projects/configs/far3d.py:287, measured by tools/analysis_tools/benchmark.py
with 5 warmup + timed loop). vs_baseline = our frames/s / 0.914.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 6.4 / 7.0  # reference: 6.4 img/s over 7-camera frames


def _wait_for_backend(tries: int = 5, delay_s: float = 45.0):
    """The tunneled TPU backend occasionally fails init with a transient
    UNAVAILABLE; retry before giving up on the whole benchmark run."""
    for i in range(tries):
        try:
            jax.devices()
            return
        except RuntimeError as e:
            if i == tries - 1:
                raise
            print(f'# backend init failed ({e}); retry {i + 1}/{tries} '
                  f'in {delay_s:.0f}s', file=sys.stderr, flush=True)
            from jax._src import api as _api
            _api.clear_backends()
            time.sleep(delay_s)


def main():
    _wait_for_backend()
    from far3d_tpu import Far3D, Far3DConfig, decode_detections, init_state
    from far3d_tpu.utils.synthetic import synthetic_batch

    cfg = Far3DConfig()
    model = Far3D(cfg)
    b = 1
    data = synthetic_batch(cfg, batch=b, as_dict=True)
    dtype = jnp.bfloat16
    kwargs = dict(
        images=jnp.asarray(data['images'], dtype),
        lidar2img=jnp.asarray(data['lidar2img']),
        intrinsics=jnp.asarray(data['intrinsics']),
        extrinsics=jnp.asarray(data['extrinsics']),
        prev_exists=jnp.zeros((b,)),
        timestamp=jnp.zeros((b,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
    )
    tstate = init_state(b, cfg.head)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), state=tstate,
                                    **kwargs)

    # Serving mode: int8 PTQ backbone (ops/quant.py). Accuracy is bounded
    # closed-loop for both families (docs/SERVING.md: Far3D int8 mAP 0.8993
    # vs bf16 0.8918; StreamPETR -0.0018 mAP / -0.0024 NDS — within harness
    # noise). Fall back to the bf16 path if quantization fails so the driver
    # always gets a number.
    mode = 'int8_ptq_backbone'
    quant_tree = None
    try:
        from far3d_tpu.ops.quant import quantize_detector_backbone
        quant_tree = quantize_detector_backbone(cfg, variables,
                                                [kwargs['images']])
    except Exception as e:  # pragma: no cover - defensive serving fallback
        print(f'# int8 calibration failed ({e!r}); falling back to bf16',
              file=sys.stderr, flush=True)
        mode = 'bf16'
        quant_tree = None

    # every input is a jit ARGUMENT: closure-captured constants silently
    # corrupt pallas custom-call programs on this TPU runtime (CLAUDE.md)
    @jax.jit
    def step(variables, tstate, kw, quant_tree):
        out = model.apply(variables, state=tstate, quant_backbone=quant_tree,
                          **kw)
        dets = decode_detections(out['all_cls_scores'][-1],
                                 out['all_bbox_preds'][-1],
                                 out['query_valid'], cfg)
        return dets, out['state']

    import numpy as np
    # warmup (compile); note jax.block_until_ready does NOT sync on this
    # image's TPU runtime — a host fetch is the only reliable barrier
    dets, tstate = step(variables, tstate, kwargs, quant_tree)
    float(np.asarray(dets['scores']).ravel()[0])
    for _ in range(4):
        dets, tstate = step(variables, tstate, kwargs, quant_tree)
    float(np.asarray(dets['scores']).ravel()[0])

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        dets, tstate = step(variables, tstate, kwargs, quant_tree)
    float(np.asarray(dets['scores']).ravel()[0])
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    print(json.dumps({
        'metric': 'far3d_7cam_960x640_stream_fps',
        'value': round(fps, 4),
        'unit': 'frames/s/chip',
        'vs_baseline': round(fps / BASELINE_FPS, 4),
        'mode': mode,
    }))


if __name__ == '__main__':
    main()
