"""Training-stability soak on real hardware (VERDICT r2 item 9).

Two phases, both on full-size config with synthetic batches (no dataset
needed):

1. Resume bit-exactness: run N iters continuously vs N/2 + orbax checkpoint
   + restore into a fresh state + N/2 more, and compare final params
   bitwise. Catches any state not captured by the checkpoint (optimizer
   slots, EMA, RNG folding, step counters). Reference analogue: mmcv
   resume_from semantics (mmdet_train.py:199-204).
2. Stability soak: --iters full-size steps across the UseGtDepth curriculum
   switch (hook.py:4-23), watching total_loss / grad_norm for NaN or blowup;
   writes one JSON line per log window to --log.

Usage (TPU):
  python tools/soak.py --iters 300 --switch-at 150 --log soak.jsonl
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=300)
    ap.add_argument('--switch-at', type=int, default=150)
    ap.add_argument('--resume-iters', type=int, default=20)
    ap.add_argument('--log', default='soak.jsonl')
    ap.add_argument('--work', default='/tmp/soak_ckpt')
    ap.add_argument('--tiny', action='store_true',
                    help='tiny config (CPU smoke of this tool)')
    args = ap.parse_args()

    # persistent compile cache: the full-size train step takes minutes to
    # compile through the axon remote-compile endpoint; cache it across runs
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_tpu_cache')
    import jax
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        # sitecustomize force-registers the axon TPU backend; the env var
        # alone does not switch (CLAUDE.md) — update the config explicitly
        jax.config.update('jax_platforms', 'cpu')
    import numpy as np

    from far3d_tpu.config import Far3DConfig, tiny_test_config
    from far3d_tpu.train.step import create_train_state, make_train_step
    from far3d_tpu.utils.checkpoint import CheckpointManager
    from far3d_tpu.utils.synthetic import synthetic_batch

    cfg = tiny_test_config() if args.tiny else Far3DConfig()
    import dataclasses
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, use_gt_depth_until_iter=args.switch_at, warmup_iters=20))

    steps = {
        True: jax.jit(make_train_step(cfg, use_gt_depth=True)),
        False: jax.jit(make_train_step(cfg, use_gt_depth=False)),
    }
    batches = [synthetic_batch(cfg, batch=1, seed=s) for s in range(4)]
    rng = jax.random.PRNGKey(42)

    # ---- phase 1: resume bit-exactness -------------------------------
    n = args.resume_iters
    print(f'[soak] phase 1: resume bit-exactness over {n} iters', flush=True)

    def run_iters(state, tstate, start, count):
        for i in range(start, start + count):
            use_gt = i < cfg.train.use_gt_depth_until_iter
            state, tstate, m = steps[use_gt](state, tstate,
                                             batches[i % len(batches)], rng)
        return state, tstate, m

    # keep at most ONE full train state on device at a time: params + two
    # Adam slots x three states exhausted TPU memory on the first attempt
    state, tstate0 = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    s_cont, _, _ = run_iters(state, tstate0, 0, n)
    cont_params = jax.device_get(s_cont.params)
    del state, s_cont

    state2, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    s_half, _, _ = run_iters(state2, tstate0, 0, n // 2)
    del state2
    os.makedirs(args.work, exist_ok=True)
    mgr = CheckpointManager(args.work, max_to_keep=1, save_interval=1)
    mgr.save(n // 2, s_half)
    mgr.close()
    del s_half

    fresh, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    restored = CheckpointManager(args.work).restore(fresh)
    assert restored is not None and int(restored.step) == n // 2
    del fresh
    s_res, _, _ = run_iters(restored, tstate0, n // 2, n - n // 2)

    mismatches = []
    flat_a = jax.tree_util.tree_flatten_with_path(cont_params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(s_res.params)[0]
    for (pa, a), (_, b) in zip(flat_a, flat_b):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            mismatches.append(jax.tree_util.keystr(pa))
    if mismatches:
        print(f'[soak] RESUME MISMATCH in {len(mismatches)} leaves: '
              f'{mismatches[:5]}')
        sys.exit(1)
    print('[soak] resume bit-exact: PASS', flush=True)
    del s_res, restored

    # ---- phase 2: stability across the curriculum switch -------------
    print(f'[soak] phase 2: {args.iters} iters, switch at {args.switch_at}',
          flush=True)
    state, tstate = create_train_state(cfg, jax.random.PRNGKey(1), batch=1)
    t0 = time.perf_counter()
    window = 10
    with open(args.log, 'w') as f:
        for i in range(args.iters):
            use_gt = i < cfg.train.use_gt_depth_until_iter
            state, tstate, m = steps[use_gt](state, tstate,
                                             batches[i % len(batches)], rng)
            if (i + 1) % window == 0 or i + 1 == args.switch_at:
                loss = float(np.asarray(m['total_loss']))
                gn = float(np.asarray(m['grad_norm']))
                dt = (time.perf_counter() - t0) / window
                t0 = time.perf_counter()
                rec = {'iter': i + 1, 'loss': loss, 'grad_norm': gn,
                       's_per_it': round(dt, 3), 'use_gt_depth': use_gt}
                f.write(json.dumps(rec) + '\n')
                f.flush()
                print('[soak]', json.dumps(rec), flush=True)
                if not (np.isfinite(loss) and np.isfinite(gn)):
                    print('[soak] NON-FINITE — FAIL')
                    sys.exit(1)
    print('[soak] stability: PASS')


if __name__ == '__main__':
    main()
