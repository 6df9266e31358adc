"""Auction matcher vs scipy Hungarian oracle."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from far3d_tpu.train.matching import auction_match, hungarian_match


def test_auction_near_optimal():
    rng = np.random.RandomState(0)
    for trial in range(5):
        r, c = 64, 13
        cost = rng.rand(r, c).astype(np.float32) * 10
        got = np.asarray(auction_match(jnp.asarray(cost)))
        rows, cols = linear_sum_assignment(cost)
        opt = cost[rows, cols].sum()
        ours = cost[got, np.arange(c)].sum()
        # distinct rows (a valid assignment)
        assert len(set(got.tolist())) == c, got
        assert ours <= opt + 0.05 * abs(opt) + 0.1, (ours, opt)


def test_auction_with_invalid_columns():
    rng = np.random.RandomState(1)
    r, c = 32, 10
    cost = rng.rand(r, c).astype(np.float32)
    valid = np.zeros(c, bool)
    valid[:4] = True
    got = np.asarray(auction_match(jnp.asarray(cost), jnp.asarray(valid)))
    rows, cols = linear_sum_assignment(cost[:, :4])
    opt = cost[rows, cols].sum()
    ours = cost[got[:4], np.arange(4)].sum()
    assert len(set(got[:4].tolist())) == 4
    assert ours <= opt + 0.1, (ours, opt)


def test_batched():
    rng = np.random.RandomState(2)
    cost = rng.rand(3, 20, 6).astype(np.float32)
    got = np.asarray(hungarian_match(jnp.asarray(cost)))
    assert got.shape == (3, 6)
    for b in range(3):
        assert len(set(got[b].tolist())) == 6
