"""Closed-loop accuracy demonstration for the second model family:
StreamPETR train -> decode -> match -> nuScenes NDS metrics.

The nuScenes twin of tools/overfit_demo.py: overfits the tiny StreamPETR
config on a learnable synthetic nuScenes-format disk dataset
(utils/synthetic.py:make_learnable_nusc_dataset) and evaluates the in-house
nuScenes protocol (eval/nuscenes_metrics.py) on the training frames every
--eval-every iters. A correct train / decode / match / metric stack must
drive mAP toward 1; a silent target-assembly, codec, or metric bug caps it.
In-environment stand-in for the reference's end-to-end metric QC while real
nuScenes data is unavailable (reference eval entry:
datasets/nuscenes_dataset.py:23). Also exercised by
tests/test_closed_loop.py::test_petr_closed_loop (marked slow).

Usage:
  JAX_PLATFORMS=cpu python tools/overfit_nusc_demo.py --work /tmp/overfit_n \
      --iters 1500 --eval-every 500 --lr 2.5e-3
Writes {work}/curve.jsonl with one {"iter", "mAP", "NDS"} line per eval.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_configs(iters, lr=2.5e-3):
    """Tiny StreamPETR config + overfit-demo training knobs (the demo
    validates the stack, not the nuScenes recipe)."""
    from far3d_tpu.config import TrainConfig
    from far3d_tpu.models.streampetr import tiny_petr_config
    cfg = tiny_petr_config()
    tcfg = dataclasses.replace(
        TrainConfig(), lr=lr, warmup_iters=50, use_grid_mask=False,
        total_iters=iters, use_gt_depth_until_iter=0, ema_decay=0.0)
    return cfg, tcfg


def run_closed_loop_nusc(work, iters, eval_every=500, lr=2.5e-3, batch=2,
                         seed=0):
    """Build the dataset, train, eval every eval_every iters; returns the
    curve [{'iter', 'mAP', 'NDS'}] (also appended to {work}/curve.jsonl)."""
    import jax
    import numpy as np
    from far3d_tpu.data.loader import EvalLoader, TrainLoader
    from far3d_tpu.data.nuscenes_dataset import NuScenesSequenceDataset
    from far3d_tpu.eval.petr_runner import (collect_and_evaluate_nusc,
                                            petr_host_config,
                                            run_inference_petr)
    from far3d_tpu.train.petr_step import (create_petr_train_state,
                                           make_petr_train_step)
    from far3d_tpu.utils.synthetic import make_learnable_nusc_dataset

    os.makedirs(work, exist_ok=True)
    ann = os.path.join(work, 'infos.pkl')
    cfg, tcfg = build_configs(iters, lr)
    src_hw = cfg.input_hw                     # identity resize, no crop
    make_learnable_nusc_dataset(ann, work, seed=seed, src_hw=src_hw)

    host_cfg = petr_host_config(cfg, (src_hw[1], src_hw[0]))
    host_cfg = host_cfg.replace(
        data=dataclasses.replace(host_cfg.data, max_gt=8, max_gt_2d=8))

    train_ds = NuScenesSequenceDataset(ann, work, seq_split_num=2)
    eval_ds = NuScenesSequenceDataset(ann, work, seq_split_num=1)

    state, tstate0 = create_petr_train_state(
        cfg, jax.random.PRNGKey(seed), batch=batch, train_cfg=tcfg)
    step = jax.jit(make_petr_train_step(cfg, tcfg))

    curve = []
    curve_path = os.path.join(work, 'curve.jsonl')

    def eval_fn(state, it):
        variables = {'params': state.params, 'stats': state.stats}
        loader = EvalLoader(eval_ds, host_cfg, num_threads=2)
        results = run_inference_petr(cfg, variables, loader)
        _, means = collect_and_evaluate_nusc(eval_ds, results)
        rec = {'iter': it, 'mAP': float(means['mAP']),
               'NDS': float(means['NDS'])}
        print('EVAL', json.dumps(rec), flush=True)
        curve.append(rec)
        with open(curve_path, 'a') as f:
            f.write(json.dumps(rec) + '\n')

    loader = TrainLoader(train_ds, host_cfg, batch_size=batch, seed=seed,
                         num_threads=2)
    tstate = tstate0
    try:
        import time
        t0 = time.time()
        for it, batch_data in enumerate(loader):
            if it >= iters:
                break
            state, tstate, metrics = step(state, tstate, batch_data,
                                          jax.random.PRNGKey(seed + 1))
            if it % 100 == 0:
                loss = float(np.asarray(metrics['total_loss']))
                print(f'iter {it} loss {loss:.4f} '
                      f'({(it + 1) / (time.time() - t0):.2f} it/s)',
                      flush=True)
            if (it + 1) % eval_every == 0:
                eval_fn(state, it + 1)
    finally:
        loader.stop()
    if not curve or curve[-1]['iter'] != iters:
        eval_fn(state, iters)
    # final weights restorable (tools/quant_accuracy_nusc.py re-evaluates
    # the same checkpoint under the int8 backbone)
    from far3d_tpu.utils.checkpoint import CheckpointManager
    mgr = CheckpointManager(work)
    mgr.save(iters, state, force=True)
    mgr.close()
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--work', required=True)
    ap.add_argument('--iters', type=int, default=1500)
    ap.add_argument('--eval-every', type=int, default=500)
    ap.add_argument('--lr', type=float, default=2.5e-3)
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    import jax
    if os.environ['JAX_PLATFORMS'] == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    run_closed_loop_nusc(args.work, args.iters, args.eval_every, args.lr,
                         args.batch, args.seed)


if __name__ == '__main__':
    main()
