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

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()


def _make_disk_dataset(root: Path, n_frames: int):
    """Synthetic AV2 clip at native camera resolutions on disk: 1 scene,
    7 cams (front portrait 2048x1550, six landscape 1550x2048), JPEG files.
    Exercises the full host path the reference benchmark pays for
    (tools/analysis_tools/benchmark.py:29-111 iterates a real data_loader)."""
    import pickle

    import cv2
    import numpy as np
    rng = np.random.RandomState(0)
    # smooth base + mild noise: realistic JPEG size / decode cost, unlike
    # pure noise (pathological) or constant (trivial)
    yy = np.linspace(0, 255, 2048, dtype=np.float32)
    infos = []
    for f in range(n_frames):
        ego = np.eye(4)
        ego[:3, 3] = [f * 2.0, 0, 0]
        cam_infos = {}
        for c in range(7):
            portrait = (c == 0)
            h, w = (2048, 1550) if portrait else (1550, 2048)
            fpath = f'scene0/cam{c}/{f}.jpg'
            path = root / fpath
            path.parent.mkdir(parents=True, exist_ok=True)
            img = (yy[:h, None, None] + rng.rand(h, w, 3).astype(np.float32)
                   * 40.0).clip(0, 255).astype(np.uint8)
            cv2.imwrite(str(path), img, [cv2.IMWRITE_JPEG_QUALITY, 90])
            intr = np.array([[1700.0, 0, w / 2], [0, 1700.0, h / 2],
                             [0, 0, 1.0]])
            ego_cam = np.eye(4)
            ego_cam[:3, 3] = [1.0, 0, 1.5]
            cam_infos[f'cam{c}'] = dict(
                fpath=fpath, intrinsics=intr, ego_SE3_cam=ego_cam,
                city_SE3_ego_cam_t=ego, cam_timestamp_ns=f * int(1e8))
        m = 20
        boxes = np.concatenate([
            rng.uniform(-60, 60, (m, 2)), rng.uniform(0, 2, (m, 1)),
            rng.uniform(1, 5, (m, 3)), rng.uniform(-3, 3, (m, 1))], axis=1)
        infos.append(dict(
            scene_id='scene0', lidar_timestamp_ns=f * int(1e8),
            city_SE3_ego_lidar_t=ego, cam_infos=cam_infos,
            gt3d_infos=dict(gt_boxes=boxes.astype(np.float32),
                            gt_names=np.array(['REGULAR_VEHICLE'] * m),
                            num_interior_pts=np.full(m, 5)),
            gt2d_infos=dict(
                gt_2dbboxes=[np.zeros((0, 4), np.float32)] * 7,
                gt_2dlabels=[np.zeros((0,), np.int64)] * 7,
                centers2d=[np.zeros((0, 2), np.float32)] * 7,
                depths=[np.zeros((0,), np.float32)] * 7)))
    with open(root / 'infos.pkl', 'wb') as f:
        pickle.dump({'infos': infos}, f)
    return str(root / 'infos.pkl'), str(root)


def run_host_io(args):
    """End-to-end serving FPS including host IO: JPEG decode + resize/crop +
    normalize for 7 cameras per frame through the threaded EvalLoader,
    overlapped with the jitted device step."""
    import tempfile

    import jax
    import numpy as np
    from far3d_tpu import Far3DConfig, init_state
    from far3d_tpu.data.av2_dataset import AV2SequenceDataset
    from far3d_tpu.data.loader import EvalLoader
    from far3d_tpu.eval.runner import run_inference
    from far3d_tpu.train.step import create_train_state

    from far3d_tpu.config import apply_overrides
    cfg = apply_overrides(Far3DConfig(), args.set)
    root = Path(tempfile.gettempdir()) / 'far3d_hostio_bench'
    ann = root / 'infos.pkl'
    if not ann.exists():
        print(f'# generating disk dataset ({args.iters} frames)...',
              file=sys.stderr)
        root.mkdir(parents=True, exist_ok=True)
        _make_disk_dataset(root, args.iters)
    state, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    variables = {'params': state.params, 'stats': state.stats,
                 'batch_stats': state.batch_stats}
    dataset = AV2SequenceDataset(str(ann), str(root), split='val',
                                 seq_split_num=1, test_mode=True,
                                 filter_empty_gt=False)
    # warmup: compile the infer step + fill the OS page cache for the jpgs
    run_inference(cfg, variables, EvalLoader(dataset, cfg, max_frames=2))
    t0 = time.perf_counter()
    results = run_inference(cfg, variables, EvalLoader(dataset, cfg))
    dt = time.perf_counter() - t0
    n = len(results)
    fps = n / dt
    print(json.dumps({
        'metric': 'stream_fps_with_host_io', 'value': round(fps, 4),
        'unit': 'frames/s/chip', 'frames': n,
        'ms_per_frame': round(1000 * dt / n, 2)}))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=100)
    p.add_argument('--warmup', type=int, default=5)
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--train-step', action='store_true',
                   help='benchmark the training step instead of inference')
    p.add_argument('--host-io', action='store_true',
                   help='stream a native-resolution disk dataset through the '
                        'threaded loader (decode+resize included in timing)')
    p.add_argument('--quant', action='store_true',
                   help='int8 PTQ backbone serving mode (ops/quant.py): '
                        'calibrate on the benchmark input, then time the '
                        'quantized forward')
    p.add_argument('--set', action='append', default=[], metavar='KEY=VAL',
                   help='dotted config overrides, e.g. decoder.remat=False')
    args = p.parse_args()

    if args.host_io:
        run_host_io(args)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np
    from far3d_tpu import Far3D, Far3DConfig, decode_detections, init_state
    from far3d_tpu.utils.backend import wait_for_backend
    from far3d_tpu.utils.synthetic import synthetic_batch
    wait_for_backend()

    from far3d_tpu.config import apply_overrides
    cfg = apply_overrides(Far3DConfig(), args.set)
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
    print('# compiling model.init ...', file=sys.stderr, flush=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), state=tstate,
                                    **kwargs)

    quant_tree = None
    if args.quant:
        from far3d_tpu.ops.quant import quantize_detector_backbone
        # float synthetic images are standard-normal, i.e. already in the
        # detector's post-normalize domain; integer inputs are normalized
        # inside quantize_detector_backbone
        print('# calibrating int8 backbone ...', file=sys.stderr, flush=True)
        quant_tree = quantize_detector_backbone(cfg, variables,
                                                [kwargs['images']])
        print('# calibration done', file=sys.stderr, flush=True)

    # all inputs are jit ARGUMENTS — closure-captured constants corrupt
    # pallas custom-call programs on this TPU runtime (CLAUDE.md)
    @jax.jit
    def step(variables, tstate, kw, quant_tree):
        out = model.apply(variables, state=tstate, quant_backbone=quant_tree,
                          **kw)
        dets = decode_detections(out['all_cls_scores'][-1],
                                 out['all_bbox_preds'][-1],
                                 out['query_valid'], cfg)
        return dets, out['state']

    import numpy as np
    print('# compiling + warming the step ...', file=sys.stderr, flush=True)
    for _ in range(args.warmup):
        dets, tstate = step(variables, tstate, kwargs, quant_tree)
    float(np.asarray(dets['scores']).ravel()[0])
    print('# timing ...', file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        dets, tstate = step(variables, tstate, kwargs, quant_tree)
    float(np.asarray(dets['scores']).ravel()[0])
    dt = time.perf_counter() - t0
    fps = args.iters * b / dt
    print(json.dumps({
        'metric': 'far3d_7cam_960x640_stream_fps'
                  + ('_int8' if args.quant else ''),
        'value': round(fps, 4),
        'unit': 'frames/s/chip', 'imgs_per_s': round(fps * 7, 2),
        'ms_per_frame': round(1000 * dt / (args.iters * b), 2)}))


if __name__ == '__main__':
    main()
