"""Learning sanity: overfitting a single synthetic batch must reduce the loss
(end-to-end gradient flow through backbone, 2D head, DN, decoder, matcher)."""

import dataclasses

import jax
import numpy as np

from far3d_tpu.config import tiny_test_config
from far3d_tpu.train.step import create_train_state, make_train_step
from far3d_tpu.utils.synthetic import synthetic_batch


def test_loss_decreases_when_overfitting():
    cfg = tiny_test_config()
    # higher LR + no warmup for a fast visible drop
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, lr=2e-3, warmup_iters=1, use_grid_mask=False))
    state, tstate = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    batch = synthetic_batch(cfg, batch=1, seed=3)
    step = jax.jit(make_train_step(cfg, use_gt_depth=True))
    rng = jax.random.PRNGKey(7)

    first = None
    last = None
    tstate0 = tstate
    for i in range(30):
        state, _, metrics = step(state, tstate0, batch, rng)
        v = float(np.asarray(metrics['total_loss']))
        assert np.isfinite(v), f'loss blew up at iter {i}: {v}'
        if first is None:
            first = v
        last = v
    assert last < first * 0.8, (first, last)
