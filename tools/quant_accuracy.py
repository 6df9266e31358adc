"""Bound the int8 PTQ backbone's accuracy impact with the closed-loop
harness (the promise in ops/quant.py's docstring): train the tiny model to
high mAP on the learnable synthetic dataset (tools/overfit_demo.py), then
evaluate the SAME checkpoint with the bf16 backbone and with the quantized
backbone and report the mAP/CDS delta.

  JAX_PLATFORMS=cpu python tools/quant_accuracy.py --work /tmp/quant_acc \
      [--iters 2000] [--calib-frames 8]

Prints one JSON line {"bf16": {...}, "int8": {...}, "delta_mAP": ...}.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--work', required=True)
    ap.add_argument('--iters', type=int, default=2000)
    ap.add_argument('--lr', type=float, default=2.5e-3)
    ap.add_argument('--calib-frames', type=int, default=8)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    import jax
    if os.environ['JAX_PLATFORMS'] == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    from overfit_demo import build_config, run_closed_loop

    from far3d_tpu.data.av2_dataset import AV2SequenceDataset
    from far3d_tpu.data.loader import EvalLoader
    from far3d_tpu.eval.runner import collect_and_evaluate, run_inference
    from far3d_tpu.ops.quant import quantize_detector_backbone
    from far3d_tpu.train.step import create_train_state
    from far3d_tpu.utils.checkpoint import CheckpointManager

    cfg = build_config(args.iters, eval_every=args.iters, lr=args.lr,
                       gt_depth_until=args.iters // 2)
    ann = os.path.join(args.work, 'infos.pkl')
    state, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    restored = CheckpointManager(args.work).restore(state)
    if restored is None:
        curve = run_closed_loop(args.work, args.iters,
                                eval_every=args.iters, lr=args.lr,
                                gt_depth_until=args.iters // 2,
                                seed=args.seed)
        print('# trained:', curve[-1], file=sys.stderr)
        restored = CheckpointManager(args.work).restore(state)
    state = restored
    variables = {'params': state.params, 'stats': state.stats,
                 'batch_stats': state.batch_stats}

    eval_ds = AV2SequenceDataset(ann, args.work, split='val', seq_split_num=1,
                                 test_mode=False)
    calib = [f['images'][None] for _, f in zip(
        range(args.calib_frames),
        EvalLoader(eval_ds, cfg, max_frames=args.calib_frames))]
    quant_tree = quantize_detector_backbone(cfg, variables, calib)

    report = {}
    for tag, qt in (('bf16', None), ('int8', quant_tree)):
        results = run_inference(cfg, variables, EvalLoader(eval_ds, cfg),
                                quant_tree=qt)
        _, means = collect_and_evaluate(
            cfg, eval_ds, os.path.join(args.work, f'results_{tag}'), 0, 1,
            results)
        report[tag] = {'mAP': round(float(means['mAP']), 4),
                       'CDS': round(float(means.get('CDS', 0.0)), 4)}
    report['delta_mAP'] = round(report['int8']['mAP']
                                - report['bf16']['mAP'], 4)
    report['delta_CDS'] = round(report['int8']['CDS']
                                - report['bf16']['CDS'], 4)
    print(json.dumps(report))


if __name__ == '__main__':
    main()
