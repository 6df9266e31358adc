#!/usr/bin/env python
"""Per-chip training-throughput sweep: frames/s of training across
(batch, remat) configurations.

The reference trains batch-1-per-GPU on 8 GPUs (far3d.py:260-283); our
recorded 2.44 it/s is batch 1 with remat off (docs/PROFILE.md). Nothing yet
measures whether batch 2-4 — with remat on where HBM demands it — yields
more *training frames per second per chip* (batch x it/s): larger batches
amortize dispatch and may fill MXU tiles better at the decoder's small
shapes, while remat re-runs the forward inside the backward (+~26% step
time at batch 1).

Each config compiles its own step (several minutes each through the remote
Pallas compile endpoint); an OOM or compile failure is recorded and the
sweep continues.

python tools/dev_train_throughput.py [--iters 10] [--configs 1,off 2,off ...]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()


def run_config(batch: int, remat: bool, iters: int) -> float:
    import dataclasses
    import jax
    import numpy as np
    from far3d_tpu import Far3DConfig
    from far3d_tpu.train.step import create_train_state, make_train_step
    from far3d_tpu.utils.synthetic import synthetic_batch

    cfg = Far3DConfig()
    cfg = cfg.replace(
        backbone=dataclasses.replace(cfg.backbone, remat=remat),
        decoder=dataclasses.replace(cfg.decoder, remat=remat))
    state, tstate = create_train_state(cfg, jax.random.PRNGKey(0),
                                       batch=batch)
    data = jax.device_put(synthetic_batch(cfg, batch=batch))
    # donate the temporal carry like tools/benchmark.py --train-step
    step = jax.jit(make_train_step(cfg, use_gt_depth=True),
                   donate_argnums=(1,))
    rng = jax.random.PRNGKey(7)
    t_c0 = time.perf_counter()
    state, tstate, metrics = step(state, tstate, data, rng)
    # host fetch is the only reliable sync on this runtime (CLAUDE.md)
    float(np.asarray(metrics['total_loss']))
    print(f'#   compiled+first step in {time.perf_counter() - t_c0:.0f} s',
          file=sys.stderr, flush=True)
    for _ in range(2):
        state, tstate, metrics = step(state, tstate, data, rng)
    float(np.asarray(metrics['total_loss']))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, tstate, metrics = step(state, tstate, data, rng)
    float(np.asarray(metrics['total_loss']))
    dt = time.perf_counter() - t0
    it_s = iters / dt
    print(f'batch={batch} remat={"on" if remat else "off"}: '
          f'{it_s:.3f} it/s = {batch * it_s:.3f} training frames/s/chip '
          f'({1000 * dt / iters:.0f} ms/step)', flush=True)
    return batch * it_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--configs', nargs='*',
                   default=['1,off', '2,off', '2,on', '4,on'],
                   help='batch,remat pairs')
    args = p.parse_args()

    best = (None, 0.0)
    for spec in args.configs:
        b_s, r_s = spec.split(',')
        batch, remat = int(b_s), r_s == 'on'
        try:
            fps = run_config(batch, remat, args.iters)
        except Exception as e:
            print(f'batch={batch} remat={r_s}: FAILED '
                  f'({type(e).__name__}: {str(e)[:200]})', flush=True)
            continue
        if fps > best[1]:
            best = (spec, fps)
    if best[0] is not None:
        print(f'BEST: {best[0]} -> {best[1]:.3f} training frames/s/chip')


if __name__ == '__main__':
    main()
