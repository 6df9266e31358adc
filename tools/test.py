#!/usr/bin/env python
"""Streaming evaluation CLI (reference: tools/test.py + dist_test.sh).

python tools/test.py --data-root data/av2 --checkpoint work_dirs/far3d \
    [--torch-checkpoint iter_82548.pth] [--eval-range-m 150]

Unlike the reference (which asserts on non-distributed runs,
tools/test.py:224-227), single-host single-chip evaluation just works; for
multi-host, launch one process per host — each streams a contiguous shard and
rank 0 aggregates the AV2 metrics.
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
    p.add_argument('--checkpoint', default=None, help='orbax work dir')
    p.add_argument('--torch-checkpoint', default=None,
                   help='reference .pth to convert & evaluate')
    p.add_argument('--results-dir', default='work_dirs/far3d/results')
    p.add_argument('--eval-range-m', type=float, default=None)
    p.add_argument('--map-root', default=None,
                   help='AV2 sensor-data root containing {log_id}/map/ dirs; '
                        'enables the official HD-map ROI gate '
                        '(av2_eval_util.py:158-318)')
    p.add_argument('--submission', default=None,
                   help='optional AV2 feather submission output path')
    p.add_argument('--use-ema', action='store_true',
                   help='evaluate the EMA shadow params from the checkpoint '
                        '(requires training with train.ema_decay > 0)')
    p.add_argument('--set', dest='overrides', action='append', default=[],
                   metavar='KEY=VALUE',
                   help='config override, e.g. --set depthnet.num_depth_bins=30 '
                        '(reference --cfg-options)')
    p.add_argument('--tiny', action='store_true',
                   help='tiny test config (CPU-sized; for fixture runs)')
    p.add_argument('--quant', action='store_true',
                   help='int8 PTQ backbone serving mode (ops/quant.py): '
                        'calibrate on the first --quant-calib-frames frames, '
                        'then evaluate with the quantized backbone')
    p.add_argument('--quant-calib-frames', type=int, default=8)
    args = p.parse_args()

    import jax
    import numpy as np
    from far3d_tpu.config import (AV2_CLASS_NAMES, Far3DConfig,
                                  apply_overrides, tiny_test_config)
    from far3d_tpu.data.av2_dataset import AV2SequenceDataset
    from far3d_tpu.data.loader import EvalLoader
    from far3d_tpu.eval.runner import (collect_and_evaluate,
                                       format_av2_submission, run_inference)
    from far3d_tpu.parallel.mesh import init_distributed
    from far3d_tpu.train.step import create_train_state
    from far3d_tpu.utils.checkpoint import CheckpointManager

    init_distributed()
    cfg = tiny_test_config() if args.tiny else Far3DConfig()
    cfg = apply_overrides(cfg, args.overrides)
    if args.use_ema:
        # re-create the state with the EMA slot so orbax restore matches
        import dataclasses
        cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    ema_decay=0.999))
    rank, world = jax.process_index(), jax.process_count()
    ann = args.ann_file or f'{args.data_root}/av2_val_infos.pkl'
    dataset = AV2SequenceDataset(ann, args.data_root, split='val',
                                 interval_test=True, test_mode=False,
                                 seq_split_num=1)

    state, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    if args.torch_checkpoint:
        from far3d_tpu.utils.torch_convert import (convert_state_dict,
                                                   load_torch_checkpoint)
        sd = load_torch_checkpoint(args.torch_checkpoint)
        variables = {'params': state.params, 'stats': state.stats,
                     'batch_stats': state.batch_stats}
        out, missing = convert_state_dict(sd, cfg, variables)
        print(f'converted {args.torch_checkpoint}; {len(missing)} missing')
        variables = out
    elif args.checkpoint:
        mgr = CheckpointManager(args.checkpoint)
        state = mgr.restore(state)
        params = state.params
        if args.use_ema:
            assert state.ema_params is not None, 'checkpoint has no EMA'
            params = state.ema_params
        variables = {'params': params, 'stats': state.stats,
                     'batch_stats': state.batch_stats}
    else:
        raise SystemExit('need --checkpoint or --torch-checkpoint')

    roi_masks = None
    if args.map_root:
        from far3d_tpu.eval.map_roi import build_roi_masks
        roi_masks = build_roi_masks(dataset, args.map_root)
        print('HD-map ROI gate:',
              'enabled' if roi_masks is not None else
              'no map dirs found — falling back to range gating')

    quant_tree = None
    if args.quant:
        from far3d_tpu.ops.quant import quantize_detector_backbone
        calib = [f['images'][None] for _, f in zip(
            range(args.quant_calib_frames),
            EvalLoader(dataset, cfg, max_frames=args.quant_calib_frames))]
        quant_tree = quantize_detector_backbone(cfg, variables, calib)
        print(f'int8 PTQ backbone: calibrated on {len(calib)} frames')

    loader = EvalLoader(dataset, cfg, rank=rank, world_size=world)
    results = run_inference(cfg, variables, loader, quant_tree=quant_tree)
    out = collect_and_evaluate(cfg, dataset, args.results_dir, rank, world,
                               results, eval_range_m=args.eval_range_m,
                               roi_masks=roi_masks)
    if rank == 0 and args.submission:
        df = format_av2_submission(results, AV2_CLASS_NAMES)
        df.to_feather(args.submission)
        print(f'wrote submission: {args.submission}')


if __name__ == '__main__':
    main()
