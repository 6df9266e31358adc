"""FULL-SIZE closed-loop accuracy demonstration ON THE CHIP (the
deployment-scale complement to tools/overfit_demo.py's tiny-config CPU loop):
overfit the PRODUCTION Far3D config — 960x640, 7 cameras (portrait front),
644 queries + K=256 proposals, DN on, 6 decoder layers, Pallas MSDA
forward+backward, on-device auction matching at 1156x160 — on a learnable
synthetic multi-scene dataset (utils/synthetic.py:
make_learnable_dataset_fullsize) and evaluate with the production eval path
(EvalLoader -> run_inference -> AV2 metrics) every --eval-every iters.

A correct deployment-scale learning loop must reach mAP >= 0.8
(--assert-map makes that a hard exit-code gate for regression use). This is
the in-environment stand-in for the reference's end-to-end metric QC at real
scale (argoverse2_dataset.py:224-265) while real AV2 data and the released
checkpoint are unavailable.

Host IO is taken off the table by pre-processing every frame ONCE
(deterministic augmentation) and streaming the cached tensors through the
same scene-group sampler training uses — the point here is the on-chip
learning loop (kernels, matching, losses, optimizer at real shapes), which
docs/SOAK.md's loss-only soak never closed with a metric.

Usage (TPU):
  python tools/overfit_full.py --work /tmp/overfit_full \
      --iters 2500 --eval-every 500 --assert-map 0.8
Writes {work}/curve.jsonl with one {"iter", "mAP", "CDS"} line per eval.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()


def build_config(iters, eval_every, lr, gt_depth_until):
    """Production Far3DConfig with only schedule/LR knobs adapted to a short
    overfit (architecture, budgets, kernels untouched)."""
    from far3d_tpu.config import Far3DConfig
    cfg = Far3DConfig()
    return cfg.replace(train=dataclasses.replace(
        cfg.train, lr=lr, warmup_iters=100, use_grid_mask=False,
        total_iters=iters, use_gt_depth_until_iter=gt_depth_until,
        checkpoint_every=eval_every, log_every=50))


class CachedStreamLoader:
    """Stream-preserving loader over pre-processed frames: the scene-group
    sampler semantics of TrainLoader (lanes never hop scenes mid-stream)
    without per-iteration host decode — every frame is processed once with
    the deterministic eval augmentation."""

    def __init__(self, dataset, cfg, batch_size, seed=0):
        import numpy as np

        from far3d_tpu.data.loader import _stack_batch
        from far3d_tpu.data.pipeline import process_frame
        from far3d_tpu.data.sampler import InfiniteGroupStreamSampler
        self._stack = _stack_batch
        self.frames = []
        for i in range(len(dataset)):
            rec = dataset.get_frame(i)
            self.frames.append(process_frame(
                rec, cfg, np.random.default_rng(0), train=False))
        self.sampler = InfiniteGroupStreamSampler(
            dataset.flag, batch_size, 0, 1, seed)

    def __iter__(self):
        for indices in self.sampler:
            yield self._stack([self.frames[i] for i in indices], train=True)

    def stop(self):
        pass


def run_closed_loop_full(work, iters, eval_every=500, lr=1e-3,
                         gt_depth_until=None, batch=1, seed=0,
                         resume=False):
    import numpy as np

    from far3d_tpu.data.av2_dataset import AV2SequenceDataset
    from far3d_tpu.data.loader import EvalLoader
    from far3d_tpu.eval.runner import collect_and_evaluate, run_inference
    from far3d_tpu.train.runner import run_training
    from far3d_tpu.utils.synthetic import make_learnable_dataset_fullsize

    if gt_depth_until is None:
        gt_depth_until = iters // 2
    os.makedirs(work, exist_ok=True)
    ann = os.path.join(work, 'infos.pkl')
    if not os.path.exists(ann):
        print('# generating full-size dataset ...', flush=True)
        make_learnable_dataset_fullsize(ann, work, seed=seed)
    cfg = build_config(iters, eval_every, lr, gt_depth_until)

    eval_ds = AV2SequenceDataset(ann, work, split='val', seq_split_num=1,
                                 test_mode=False)
    curve = []
    curve_path = os.path.join(work, 'curve.jsonl')

    def eval_fn(state):
        variables = {'params': state.params, 'stats': state.stats,
                     'batch_stats': state.batch_stats}
        results = run_inference(cfg, variables, EvalLoader(eval_ds, cfg))
        _, means = collect_and_evaluate(
            cfg, eval_ds, os.path.join(work, 'results'), 0, 1, results)
        rec = {'iter': int(state.step), 'mAP': float(means['mAP']),
               'CDS': float(means.get('CDS', 0.0))}
        print('EVAL', json.dumps(rec), flush=True)
        curve.append(rec)
        with open(curve_path, 'a') as f:
            f.write(json.dumps(rec) + '\n')

    train_ds = AV2SequenceDataset(ann, work, split='train', seq_split_num=2)
    print('# caching preprocessed frames ...', flush=True)
    loader = CachedStreamLoader(train_ds, cfg, batch, seed)
    state = run_training(cfg, loader, work, batch_size=batch,
                         resume=resume, max_iters=iters, eval_fn=eval_fn)
    if not curve or curve[-1]['iter'] != int(state.step):
        eval_fn(state)
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--work', required=True)
    ap.add_argument('--iters', type=int, default=2500)
    ap.add_argument('--eval-every', type=int, default=500)
    ap.add_argument('--lr', type=float, default=1e-3)
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--gt-depth-until', type=int, default=None)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--assert-map', type=float, default=None,
                    help='exit nonzero unless the final mAP reaches this')
    ap.add_argument('--resume', action='store_true',
                    help='continue an interrupted run from the latest '
                         'checkpoint in --work (fresh run is the default: '
                         'each overfit is normally a from-scratch '
                         'experiment). NOTE: the data stream and temporal '
                         'memory restart at the resume point (same policy '
                         'as the reference IterBasedRunner resume), so a '
                         'resumed curve is a valid learning trajectory but '
                         'not bit-identical to an uninterrupted one.')
    args = ap.parse_args()

    curve = run_closed_loop_full(args.work, args.iters, args.eval_every,
                                 args.lr, args.gt_depth_until, args.batch,
                                 args.seed, resume=args.resume)
    if args.assert_map is not None:
        final = curve[-1]['mAP'] if curve else 0.0
        if final < args.assert_map:
            print(f'FAIL: final mAP {final:.4f} < {args.assert_map}')
            raise SystemExit(1)
        print(f'PASS: final mAP {final:.4f} >= {args.assert_map}')


if __name__ == '__main__':
    main()
