#!/usr/bin/env python
"""Training CLI (reference: tools/train.py + dist_train.sh).

Single-host: python tools/train.py --data-root data/av2 --work-dir work_dirs/far3d
Multi-host:  set JAX_COORDINATOR_ADDRESS etc. and launch one process per host;
             the data mesh spans all hosts (no torch.distributed.launch).
"""

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-root', required=True)
    p.add_argument('--ann-file', default=None)
    p.add_argument('--work-dir', default='work_dirs/far3d')
    p.add_argument('--batch-size', type=int, default=None,
                   help='per-host batch (default: local device count)')
    p.add_argument('--max-iters', type=int, default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--no-resume', action='store_true')
    p.add_argument('--load-from', default=None,
                   help='torch checkpoint to convert & load (e.g. the FCOS3D '
                        'VoVNet backbone pretrain, far3d.py:284)')
    p.add_argument('--profile-at', type=int, default=None)
    p.add_argument('--set', dest='overrides', action='append', default=[],
                   metavar='KEY=VALUE',
                   help='config override, e.g. --set head.dn_groups=8 '
                        '--set train.lr=1e-4 (reference --cfg-options)')
    p.add_argument('--val-ann-file', default=None,
                   help='val info pkl; enables eval-during-training every '
                        'checkpoint interval (reference CustomDistEvalHook, '
                        'eval_hooks.py:29-91)')
    p.add_argument('--eval-samples', type=int, default=None,
                   help='cap val frames per in-training eval')
    p.add_argument('--tiny', action='store_true',
                   help='tiny train config (CPU-sized; for fixture runs)')
    args = p.parse_args()

    import jax
    from far3d_tpu.config import (Far3DConfig, apply_overrides,
                                  tiny_test_config)
    from far3d_tpu.data.av2_dataset import AV2SequenceDataset
    from far3d_tpu.data.loader import TrainLoader
    from far3d_tpu.parallel.mesh import init_distributed
    from far3d_tpu.train.runner import run_training

    # own handler on the package logger: absl (pulled in by jax) swaps the
    # root handler lazily at first use, which silences basicConfig-routed
    # INFO records mid-run
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter('%(asctime)s %(levelname)s %(message)s'))
    pkg_log = logging.getLogger('far3d_tpu')
    pkg_log.setLevel(logging.INFO)
    pkg_log.addHandler(handler)
    pkg_log.propagate = False
    init_distributed()
    import dataclasses
    cfg = tiny_test_config() if args.tiny else Far3DConfig()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, seed=args.seed))
    cfg = apply_overrides(cfg, args.overrides)

    rank = jax.process_index()
    world = jax.process_count()
    batch = args.batch_size or jax.local_device_count()
    ann = args.ann_file or f'{args.data_root}/av2_train_infos.pkl'
    dataset = AV2SequenceDataset(ann, args.data_root, split='train',
                                 seq_split_num=cfg.data.seq_split_num)
    loader = TrainLoader(dataset, cfg, batch, rank=rank, world_size=world,
                         seed=args.seed)
    Path(args.work_dir).mkdir(parents=True, exist_ok=True)

    eval_fn = None
    if args.val_ann_file:
        eval_fn = build_eval_fn(cfg, args.val_ann_file, args.data_root,
                                args.work_dir, rank, world,
                                max_frames=args.eval_samples)

    run_training(cfg, loader, args.work_dir, batch,
                 resume=not args.no_resume, max_iters=args.max_iters,
                 profile_at=args.profile_at, load_from=args.load_from,
                 eval_fn=eval_fn)


def build_eval_fn(cfg, val_ann, data_root, work_dir, rank, world,
                  max_frames=None):
    """Eval-during-training (reference CustomDistEvalHook._do_evaluate,
    core/evaluation/eval_hooks.py:54-91): stream the rank's val shard through
    the current params, rank 0 computes + logs AV2 metrics."""
    import json
    import numpy as np
    from far3d_tpu.data.av2_dataset import AV2SequenceDataset
    from far3d_tpu.data.loader import EvalLoader
    from far3d_tpu.eval.runner import collect_and_evaluate, run_inference

    val_ds = AV2SequenceDataset(val_ann, data_root, split='val',
                                test_mode=True,
                                seq_split_num=1)
    loader = EvalLoader(val_ds, cfg, rank=rank, world_size=world,
                        max_frames=max_frames)
    log = logging.getLogger('far3d_tpu.eval')

    def eval_fn(state):
        # evaluate the EMA shadow when tracked (cfg.train.ema_decay > 0)
        params = state.params if state.ema_params is None else \
            state.ema_params
        variables = {'params': params, 'stats': state.stats,
                     'batch_stats': state.batch_stats}
        results = run_inference(cfg, variables, loader)
        out = collect_and_evaluate(
            cfg, val_ds, f'{work_dir}/eval_step{int(state.step)}', rank,
            world, results)
        if out is not None:
            _, means = out
            m = {k: float(np.asarray(v)) for k, v in means.items()}
            log.info('eval @ step %d: %s', int(state.step), m)
            with open(f'{work_dir}/eval_metrics.jsonl', 'a') as f:
                f.write(json.dumps({'step': int(state.step), **m}) + '\n')

    return eval_fn


if __name__ == '__main__':
    main()
