"""Closed-loop accuracy demonstration: train -> decode -> match -> metric.

Overfits the tiny config on a learnable synthetic disk dataset (blob images
that encode the GT, utils/synthetic.py:make_learnable_dataset) and evaluates
the in-house AV2 metrics on the training frames every --eval-every iters.
A correct training/decoding/matching/metric stack must drive mAP >= 0.9
(measured 0.916 at iter 2000, docs/CLOSED_LOOP.md); a silent target-assembly
or decode bug caps it. This is the in-environment stand-in for the
reference's end-to-end metric QC (SURVEY §4; reference oracle
argoverse2_dataset.py:224-265) while real AV2 data and the released
checkpoint are unavailable. Also exercised by tests/test_closed_loop.py.

Usage:
  JAX_PLATFORMS=cpu python tools/overfit_demo.py --work /tmp/overfit \
      --iters 2000 --eval-every 500 --lr 2.5e-3 --gt-depth-until 1000
Writes {work}/curve.jsonl with one {"iter", "mAP", "CDS"} line per eval.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_config(iters, eval_every=500, lr=2.5e-3, gt_depth_until=1000):
    """Tiny config + the overfit-demo knobs (the demo validates the stack,
    not the reference hyperparameters):
      * pred-depth curriculum switch partway (the reference's UseGtDepthHook
        semantics) — eval lifts 2D proposals with PREDICTED depth, so the
        decoder must train on predicted seeds too;
      * stronger localization term, a proposal budget above the blob count;
      * finer LID binning than the tiny default (at 10 bins the 6-10 m range
        is one ~6 m bin, which caps how well depth seeds localize).
    """
    from far3d_tpu.config import tiny_test_config
    cfg = tiny_test_config()
    return cfg.replace(
        train=dataclasses.replace(
            cfg.train, lr=lr, warmup_iters=50, use_grid_mask=False,
            total_iters=iters, use_gt_depth_until_iter=gt_depth_until,
            checkpoint_every=eval_every, log_every=25),
        head=dataclasses.replace(cfg.head, loss_bbox_weight=1.0),
        roi2d=dataclasses.replace(cfg.roi2d, num_proposals_2d=32),
        depthnet=dataclasses.replace(cfg.depthnet, num_depth_bins=30))


def run_closed_loop(work, iters, eval_every=500, lr=2.5e-3,
                    gt_depth_until=1000, batch=2, seed=0):
    """Build the dataset, train, eval every checkpoint; returns the curve
    [{'iter', 'mAP', 'CDS'}] (also appended to {work}/curve.jsonl)."""
    from far3d_tpu.data.av2_dataset import AV2SequenceDataset
    from far3d_tpu.data.loader import EvalLoader, TrainLoader
    from far3d_tpu.eval.runner import collect_and_evaluate, run_inference
    from far3d_tpu.train.runner import run_training
    from far3d_tpu.utils.synthetic import make_learnable_dataset

    os.makedirs(work, exist_ok=True)
    ann = os.path.join(work, 'infos.pkl')
    make_learnable_dataset(ann, work, seed=seed)
    cfg = build_config(iters, eval_every, lr, gt_depth_until)

    eval_ds = AV2SequenceDataset(ann, work, split='val', seq_split_num=1,
                                 test_mode=False)
    curve = []
    curve_path = os.path.join(work, 'curve.jsonl')

    def eval_fn(state):
        variables = {'params': state.params, 'stats': state.stats,
                     'batch_stats': state.batch_stats}
        loader = EvalLoader(eval_ds, cfg)
        results = run_inference(cfg, variables, loader)
        _, means = collect_and_evaluate(cfg, eval_ds,
                                        os.path.join(work, 'results'),
                                        0, 1, results)
        rec = {'iter': int(state.step), 'mAP': float(means['mAP']),
               'CDS': float(means.get('CDS', 0.0))}
        print('EVAL', json.dumps(rec), flush=True)
        curve.append(rec)
        with open(curve_path, 'a') as f:
            f.write(json.dumps(rec) + '\n')

    train_ds = AV2SequenceDataset(ann, work, split='train', seq_split_num=2)
    loader = TrainLoader(train_ds, cfg, batch_size=batch, seed=seed,
                         num_threads=2)
    try:
        state = run_training(cfg, loader, work, batch_size=batch,
                             resume=False, max_iters=iters, eval_fn=eval_fn)
    finally:
        loader.stop()
    if not curve or curve[-1]['iter'] != int(state.step):
        eval_fn(state)
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--work', required=True)
    ap.add_argument('--iters', type=int, default=2000)
    ap.add_argument('--eval-every', type=int, default=500)
    ap.add_argument('--lr', type=float, default=2.5e-3)
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--gt-depth-until', type=int, default=1000)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    import jax
    if os.environ['JAX_PLATFORMS'] == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    run_closed_loop(args.work, args.iters, args.eval_every, args.lr,
                    args.gt_depth_until, args.batch, args.seed)


if __name__ == '__main__':
    main()
