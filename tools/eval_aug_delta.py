"""Quantify the deterministic-eval-augmentation deviation (docs/PARITY.md).

The reference samples a random resize/crop at eval time
(custom_pipeline.py:313-326 runs the same sampler for train and test); our
pipeline fixes the midpoint resize + center crop for determinism
(data/pipeline.py:60-76). This tool bounds the resulting metric deviation:
it evaluates one trained checkpoint on the same frames under (a) the
deterministic eval pipeline and (b) N seeds of reference-style random
resize/crop, and prints the mAP/CDS spread.

Usage (after tools/overfit_demo.py has produced a trained checkpoint):
  JAX_PLATFORMS=cpu python tools/eval_aug_delta.py --work /tmp/overfit \
      --seeds 3
"""

import argparse
import dataclasses
import json
import os
import sys
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--work', required=True,
                    help='overfit_demo work dir (dataset + checkpoint)')
    ap.add_argument('--seeds', type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    import jax
    if os.environ['JAX_PLATFORMS'] == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import numpy as np

    from far3d_tpu.data import pipeline as pl
    from far3d_tpu.data.av2_dataset import AV2SequenceDataset
    from far3d_tpu.data.loader import EvalLoader
    from far3d_tpu.eval.runner import collect_and_evaluate, run_inference
    from far3d_tpu.train.step import create_train_state
    from far3d_tpu.utils.checkpoint import CheckpointManager
    from overfit_demo import build_config

    cfg = build_config(iters=1)   # must match the overfit_demo checkpoint
    ann = os.path.join(args.work, 'infos.pkl')
    ds = AV2SequenceDataset(ann, args.work, split='val', seq_split_num=1,
                            test_mode=False)
    state, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    state = CheckpointManager(args.work).restore(state)
    assert state is not None, f'no checkpoint under {args.work}'
    variables = {'params': state.params, 'stats': state.stats,
                 'batch_stats': state.batch_stats}

    def evaluate(tag):
        loader = EvalLoader(ds, cfg)
        results = run_inference(cfg, variables, loader)
        _, means = collect_and_evaluate(
            cfg, ds, os.path.join(args.work, f'results_{tag}'), 0, 1, results)
        return {'mAP': float(means['mAP']), 'CDS': float(means.get('CDS', 0))}

    det = evaluate('det')
    print('deterministic:', json.dumps(det))

    orig = pl.sample_augmentation
    rand = []
    for seed in range(args.seeds):
        rng_holder = [np.random.default_rng(1000 + seed)]

        def random_aug(rng, dcfg, h, w, train, _orig=orig,
                       _hold=rng_holder):
            # reference-style: eval samples the SAME random resize/crop
            # distribution as training (custom_pipeline.py:313-326)
            return _orig(_hold[0], dcfg, h, w, True)

        with mock.patch.object(pl, 'sample_augmentation', random_aug):
            r = evaluate(f'rand{seed}')
        rand.append(r)
        print(f'random seed {seed}:', json.dumps(r))

    maps = [r['mAP'] for r in rand]
    print(json.dumps({
        'deterministic_mAP': det['mAP'],
        'random_mAP_mean': float(np.mean(maps)),
        'random_mAP_std': float(np.std(maps)),
        'delta_mAP': float(det['mAP'] - np.mean(maps)),
    }))


if __name__ == '__main__':
    main()
