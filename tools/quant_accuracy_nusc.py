"""Bound the int8 PTQ backbone's accuracy impact for the SECOND model
family (StreamPETR/nuScenes) with the closed-loop harness — the nuScenes
twin of tools/quant_accuracy.py: train the tiny StreamPETR to high mAP on
the learnable synthetic dataset (tools/overfit_nusc_demo.py), then evaluate
the SAME checkpoint with the bf16 backbone and with the quantized backbone
and report the mAP/NDS delta.

  JAX_PLATFORMS=cpu python tools/quant_accuracy_nusc.py --work /tmp/qn \
      [--iters 2500] [--calib-frames 8]

Prints one JSON line {"bf16": {...}, "int8": {...}, "delta_mAP": ...}.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--work', required=True)
    ap.add_argument('--iters', type=int, default=2500)
    ap.add_argument('--lr', type=float, default=2.5e-3)
    ap.add_argument('--calib-frames', type=int, default=8)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    import jax
    if os.environ['JAX_PLATFORMS'] == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    from overfit_nusc_demo import build_configs, run_closed_loop_nusc

    from far3d_tpu.data.loader import EvalLoader
    from far3d_tpu.data.nuscenes_dataset import NuScenesSequenceDataset
    from far3d_tpu.eval.petr_runner import (collect_and_evaluate_nusc,
                                            petr_host_config,
                                            run_inference_petr)
    from far3d_tpu.ops.quant import quantize_petr_backbone
    from far3d_tpu.train.petr_step import create_petr_train_state
    from far3d_tpu.utils.checkpoint import CheckpointManager

    cfg, tcfg = build_configs(args.iters, args.lr)
    ann = os.path.join(args.work, 'infos.pkl')
    state, _ = create_petr_train_state(cfg, jax.random.PRNGKey(args.seed),
                                       batch=2, train_cfg=tcfg)
    restored = CheckpointManager(args.work).restore(state)
    if restored is None:
        curve = run_closed_loop_nusc(args.work, args.iters,
                                     eval_every=args.iters, lr=args.lr,
                                     seed=args.seed)
        print('# trained:', curve[-1], file=sys.stderr)
        restored = CheckpointManager(args.work).restore(state)
    state = restored
    variables = {'params': state.params, 'stats': state.stats}

    host_cfg = petr_host_config(cfg, (cfg.input_hw[1], cfg.input_hw[0]))
    host_cfg = host_cfg.replace(
        data=dataclasses.replace(host_cfg.data, max_gt=8, max_gt_2d=8))
    eval_ds = NuScenesSequenceDataset(ann, args.work, seq_split_num=1)
    calib = [f['images'][None] for _, f in zip(
        range(args.calib_frames),
        EvalLoader(eval_ds, host_cfg, max_frames=args.calib_frames))]
    quant_tree = quantize_petr_backbone(cfg, variables, calib)

    report = {}
    for tag, qt in (('bf16', None), ('int8', quant_tree)):
        results = run_inference_petr(cfg, variables,
                                     EvalLoader(eval_ds, host_cfg),
                                     quant_tree=qt)
        _, means = collect_and_evaluate_nusc(eval_ds, results)
        report[tag] = {'mAP': round(float(means['mAP']), 4),
                       'NDS': round(float(means['NDS']), 4)}
    report['delta_mAP'] = round(report['int8']['mAP']
                                - report['bf16']['mAP'], 4)
    report['delta_NDS'] = round(report['int8']['NDS']
                                - report['bf16']['NDS'], 4)
    print(json.dumps(report))


if __name__ == '__main__':
    main()
