"""Hungarian matching for set-based losses.

The reference runs scipy.linear_sum_assignment on CPU from inside the torch
training step (hungarian_assigner_3d.py:73-82, farhead.py:854-856). We do the
TPU-native equivalent: cost matrices are computed on device with static padded
shapes, matching runs in a `jax.pure_callback` (host, scipy) — or fully
on-device with a jnp auction solver for host-callback-free paths.

Padding correctness: padded GT columns carry a constant large cost; with a
constant per-column cost their assignment cannot change the optimum over the
real columns, and they are dropped afterwards via `gt_mask`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BIG_COST = 1e4


def _lsa_host(cost: np.ndarray) -> np.ndarray:
    """Batched scipy Hungarian. cost (..., R, C) -> col_to_row? We return, for
    each column (GT), the matched row index (query)."""
    from scipy.optimize import linear_sum_assignment
    cost = np.nan_to_num(np.asarray(cost, np.float32), nan=100.0,
                         posinf=100.0, neginf=-100.0)
    batch_shape = cost.shape[:-2]
    r, c = cost.shape[-2:]
    flat = cost.reshape(-1, r, c)
    out = np.zeros((flat.shape[0], c), np.int32)
    for i in range(flat.shape[0]):
        rows, cols = linear_sum_assignment(flat[i])
        out[i, cols] = rows.astype(np.int32)
    return out.reshape(*batch_shape, c)


def hungarian_match(cost: jax.Array) -> jax.Array:
    """cost (..., R, C) with R >= C. Returns (..., C) int32: matched row per
    column. Runs on host via pure_callback (device->host->device roundtrip,
    like the reference's .cpu() hop)."""
    out_shape = jax.ShapeDtypeStruct(cost.shape[:-2] + (cost.shape[-1],),
                                     jnp.int32)
    return jax.pure_callback(_lsa_host, out_shape, cost, vmap_method='broadcast_all')


def auction_match(cost: jax.Array, iters: int = 200) -> jax.Array:
    """On-device approximate Hungarian via the auction algorithm (forward
    auction on the transposed problem: columns=GTs bid for rows=queries).

    cost (R, C); returns (C,) row index per column. Epsilon-scaling free,
    fixed iteration budget; with distinct costs converges to the optimal
    assignment for all practical cost matrices here."""
    r, c = cost.shape
    benefit = -cost.T                      # (C, R): each GT bids for a query
    eps = 1.0 / (r + 1)

    def body(_, carry):
        prices, owner = carry              # prices (R,), owner (R,) int col or -1
        # unassigned columns
        assigned = jnp.zeros((c,), bool).at[jnp.where(
            owner >= 0, owner, c)].set(True, mode='drop')
        value = benefit - prices[None, :]  # (C, R)
        best = jnp.argmax(value, axis=1)
        v1 = jnp.max(value, axis=1)
        value2 = value.at[jnp.arange(c), best].set(-jnp.inf)
        v2 = jnp.max(value2, axis=1)
        bid = v1 - v2 + eps
        # process one unassigned column per iteration (simple, deterministic)
        col = jnp.argmin(jnp.where(assigned, 1, 0))
        do = ~jnp.all(assigned)
        row = best[col]
        new_prices = jnp.where(do, prices.at[row].add(bid[col]), prices)
        # evict previous owner of `row`
        new_owner = jnp.where(do, owner.at[row].set(col), owner)
        return new_prices, new_owner

    prices = jnp.zeros((r,))
    owner = jnp.full((r,), -1, jnp.int32)
    prices, owner = jax.lax.fori_loop(0, iters, body, (prices, owner))
    # invert owner -> per-column row
    col_to_row = jnp.full((c,), 0, jnp.int32)
    col_to_row = col_to_row.at[jnp.where(owner >= 0, owner, 0)].set(
        jnp.arange(r, dtype=jnp.int32) * (owner >= 0))
    # fallback: columns that never won keep row 0 (they are padded cols in use)
    valid = jnp.zeros((c,), bool).at[owner].set(owner >= 0, mode='drop')
    return jnp.where(valid, col_to_row, 0)


def focal_cls_cost(cls_logits: jax.Array, gt_labels: jax.Array,
                   weight: float = 2.0, alpha: float = 0.25,
                   gamma: float = 2.0, eps: float = 1e-12) -> jax.Array:
    """mmdet FocalLossCost (far3d.py:156): (Q, ncls) logits x (G,) labels ->
    (Q, G) cost."""
    p = jax.nn.sigmoid(cls_logits)
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * p ** gamma
    pos = -jnp.log(p + eps) * alpha * (1 - p) ** gamma
    cost = pos[:, gt_labels] - neg[:, gt_labels]
    return cost * weight


def l1_bbox_cost(bbox_pred: jax.Array, gt_norm: jax.Array,
                 weight: float = 0.25) -> jax.Array:
    """BBox3DL1Cost (match_cost.py:5-23): cdist-L1 on the first 8 code dims."""
    diff = jnp.abs(bbox_pred[:, None, :8] - gt_norm[None, :, :8]).sum(-1)
    return diff * weight
