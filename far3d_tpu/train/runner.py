"""Training loop (replaces mmcv IterBasedRunner + hooks,
core/apis/mmdet_train.py:31-204).

Responsibilities of the reference's hook stack, realized directly:
  * Fp16OptimizerHook        -> bf16 compute, f32 params (no loss scaling)
  * LR hooks                 -> optax schedule (train/optim.py)
  * CheckpointHook           -> orbax CheckpointManager every N iters
  * UseGtDepthHook (22000)   -> recompile train_step with use_gt_depth=False
  * log hooks                -> per-iter loss dict logging
  * profiler stub            -> optional jax.profiler trace window
"""

from __future__ import annotations

import json
import logging
import time
from typing import Optional

import jax
import numpy as np

from ..config import Far3DConfig
from ..parallel.mesh import make_mesh, shard_batch
from ..utils.checkpoint import CheckpointManager
from .step import TrainState, create_train_state, make_train_step

log = logging.getLogger('far3d_tpu.train')


def run_training(cfg: Far3DConfig,
                 loader,
                 work_dir: str,
                 batch_size: int,
                 resume: bool = True,
                 max_iters: Optional[int] = None,
                 profile_at: Optional[int] = None,
                 eval_fn=None,
                 load_from: Optional[str] = None) -> TrainState:
    """loader: iterable of TrainBatch (already rank-local)."""
    tc = cfg.train
    max_iters = max_iters or tc.total_iters
    # data-parallel mesh over as many devices as the batch divides into
    n_dev = len(jax.devices())
    use = max(d for d in range(1, n_dev + 1) if batch_size % d == 0
              and n_dev % d == 0)
    mesh = make_mesh(jax.devices()[:use])
    state, tstate = create_train_state(
        cfg, jax.random.PRNGKey(tc.seed), batch=batch_size)
    if load_from:
        # convert + merge a reference torch checkpoint (e.g. backbone
        # pretrain, far3d.py:284 load_from)
        from ..utils.torch_convert import (convert_state_dict,
                                           load_torch_checkpoint)
        sd = load_torch_checkpoint(load_from)
        variables = {'params': state.params, 'stats': state.stats,
                     'batch_stats': state.batch_stats}
        out, missing = convert_state_dict(sd, cfg, variables)
        log.info('loaded %s (%d reference keys not found, kept init)',
                 load_from, len(missing))
        state = state.replace(params=out['params'], stats=out['stats'],
                              batch_stats=out['batch_stats'])
    ckpt = CheckpointManager(work_dir, max_to_keep=tc.keep_checkpoints,
                             save_interval=tc.checkpoint_every)
    if resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            log.info('resumed from step %d', int(state.step))

    rng = jax.random.PRNGKey(tc.seed + 1)
    step_fns = {
        True: jax.jit(make_train_step(cfg, use_gt_depth=True),
                      donate_argnums=(1,)),
        False: jax.jit(make_train_step(cfg, use_gt_depth=False),
                       donate_argnums=(1,)),
    }

    t0 = time.perf_counter()
    window = max(tc.log_every, 1)
    with jax.set_mesh(mesh):
        tstate = shard_batch(mesh, tstate)
        for batch in loader:
            it = int(state.step)
            if it >= max_iters:
                break
            if profile_at is not None and it == profile_at:
                jax.profiler.start_trace(f'{work_dir}/trace')
            batch = shard_batch(mesh, batch)
            use_gt = it < tc.use_gt_depth_until_iter  # UseGtDepthHook
            state, tstate, metrics = step_fns[use_gt](state, tstate, batch, rng)
            if profile_at is not None and it == profile_at + 3:
                jax.profiler.stop_trace()
            if (it + 1) % window == 0:
                m = {k: float(np.asarray(v)) for k, v in metrics.items()}
                dt = (time.perf_counter() - t0) / window
                t0 = time.perf_counter()
                log.info('iter %d/%d %.3fs/it total=%.4f grad=%.2f',
                         it + 1, max_iters, dt, m['total_loss'],
                         m['grad_norm'])
                with open(f'{work_dir}/metrics.jsonl', 'a') as f:
                    f.write(json.dumps({'iter': it + 1, **m}) + '\n')
            ckpt.save(it + 1, state)
            if eval_fn is not None and (it + 1) % tc.checkpoint_every == 0:
                eval_fn(state)
    # final state is always restorable, even when max_iters is not a
    # checkpoint_every multiple (orbax skips off-interval saves otherwise)
    if ckpt.latest_step() != int(state.step) and int(state.step) > 0:
        ckpt.save(int(state.step), state, force=True)
    ckpt.close()
    return state
