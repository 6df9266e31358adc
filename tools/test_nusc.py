#!/usr/bin/env python
"""StreamPETR nuScenes evaluation CLI (second model family's test path;
the reference evaluates its nuScenes dataset through mmdet3d
NuScenesDataset.evaluate + the nuscenes devkit, nuscenes_dataset.py:23).

python tools/test_nusc.py --data-root data/nuscenes \
    [--ann-file nuscenes2d_temporal_infos_val.pkl] \
    [--checkpoint work_dirs/streampetr] [--random-init]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-root', required=True)
    p.add_argument('--ann-file', default=None)
    p.add_argument('--checkpoint', default=None,
                   help='orbax dir holding {params, ...} for StreamPETR')
    p.add_argument('--random-init', action='store_true',
                   help='evaluate freshly initialized weights (pipeline '
                        'smoke / benchmarking)')
    p.add_argument('--src-wh', type=int, nargs=2, default=(1600, 900),
                   help='source camera resolution (W H)')
    p.add_argument('--max-frames', type=int, default=None)
    p.add_argument('--quant', action='store_true',
                   help='int8 PTQ backbone serving mode (ops/quant.py): '
                        'calibrate on the first --quant-calib-frames frames, '
                        'then evaluate with the quantized backbone')
    p.add_argument('--quant-calib-frames', type=int, default=8)
    p.add_argument('--set', dest='overrides', action='append', default=[],
                   metavar='KEY=VAL',
                   help='dotted StreamPETRConfig overrides')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from far3d_tpu.data.loader import EvalLoader
    from far3d_tpu.data.nuscenes_dataset import NuScenesSequenceDataset
    from far3d_tpu.eval.petr_runner import (collect_and_evaluate_nusc,
                                            petr_host_config,
                                            run_inference_petr)
    from far3d_tpu.models.streampetr import (StreamPETR, StreamPETRConfig,
                                             init_petr_state)

    from far3d_tpu.config import apply_overrides
    cfg = apply_overrides(StreamPETRConfig(), args.overrides)
    ann = args.ann_file or \
        f'{args.data_root}/nuscenes2d_temporal_infos_val.pkl'
    dataset = NuScenesSequenceDataset(ann, args.data_root, seq_split_num=1)
    host_cfg = petr_host_config(cfg, tuple(args.src_wh))

    model = StreamPETR(cfg)
    h, w = cfg.input_hw
    init_kw = dict(
        images=jnp.zeros((1, cfg.num_cams, h, w, 3)),
        lidar2img=jnp.tile(jnp.eye(4)[None, None],
                           (1, cfg.num_cams, 1, 1)),
        state=init_petr_state(1, cfg),
        prev_exists=jnp.zeros((1,)), timestamp=jnp.zeros((1,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (1, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (1, 1, 1)))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), **init_kw)
    if args.checkpoint:
        from far3d_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(args.checkpoint)
        restored = mgr.restore(
            {'params': variables['params'],
             'stats': variables.get('stats', {})})
        if restored is None:
            raise SystemExit(f'no checkpoint found in {args.checkpoint}')
        variables = restored
        mgr.close()
    elif not args.random_init:
        raise SystemExit('need --checkpoint or --random-init')

    quant_tree = None
    if args.quant:
        from far3d_tpu.ops.quant import quantize_petr_backbone
        calib = [f['images'][None] for _, f in zip(
            range(args.quant_calib_frames),
            EvalLoader(dataset, host_cfg,
                       max_frames=args.quant_calib_frames))]
        quant_tree = quantize_petr_backbone(cfg, variables, calib)
        print(f'int8 PTQ backbone: calibrated on {len(calib)} frames')

    loader = EvalLoader(dataset, host_cfg, max_frames=args.max_frames)
    results = run_inference_petr(cfg, variables, loader, quant_tree=quant_tree)
    collect_and_evaluate_nusc(dataset, results)


if __name__ == '__main__':
    main()
