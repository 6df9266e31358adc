"""Range-modulated 3D denoising queries (reference: farhead.py:315-429,
prepare_for_loss :830-871).

Static-shape translation: the reference sizes its DN set from the max GT count
per batch (groups = min(10, 600 // max_gt), single_pad = max_gt * 3). Here the
budget is fixed — `dn_groups` groups x `dn_max_gt` GT slots x `num_smp_per_gt`
samples (1 positive + num_smp-1 negatives) — and GT slots beyond the actual
count are masked invalid.

Noise model (farhead.py:344-361):
  positive: center + sign * (rand + offset_p) * (size/2 + trans) * noise_scale
  negative: center + sign * (rand + offset)   * log(|center| + 1)   (per-axis)

Per-group slot layout: [positives(dn_max_gt), neg_1(dn_max_gt), neg_2(...)].

Targets come from per-(sample, group) Hungarian matching of noised centers to
GT centers (L1 cost, farhead.py:371-377, 853-863): matched slots get the GT's
label/box, everything else is background.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import HeadConfig
from .matching import BIG_COST, hungarian_match


def build_dn_queries(key: jax.Array,
                     gt_boxes: jax.Array,     # (B, G, >=7) metric, gravity ctr
                     gt_labels: jax.Array,    # (B, G) int
                     gt_mask: jax.Array,      # (B, G) bool
                     cfg: HeadConfig,
                     pc_range) -> Dict[str, jax.Array]:
    """Returns dict with:
      ref_points (B, pad, 3) in [0,1] pc-range coords (clamped, farhead.py:379-380)
      valid      (B, pad) bool
      labels     (B, pad) int  — matched cls target (num_classes = background)
      bbox_targets (B, pad, code) metric box targets
      bbox_mask  (B, pad) bool — positive (matched) slots
      num_tgt    ()  — groups * total valid GT count (loss avg factor)
    """
    b, g = gt_labels.shape
    ngroups, nsmp = cfg.dn_groups, cfg.num_smp_per_gt
    gmax = cfg.dn_max_gt
    assert g >= gmax or True
    # take the first dn_max_gt GT slots (datasets pad/order arbitrarily)
    boxes = gt_boxes[:, :gmax]
    labels = gt_labels[:, :gmax]
    mask = gt_mask[:, :gmax]
    center = boxes[..., :3]
    size = boxes[..., 3:6]

    kp, kps, kn, kns = jax.random.split(key, 4)
    # positives (B, ngroups, gmax, 3)
    shape_p = (b, ngroups, gmax, 3)
    diff_p = (size[:, None] / 2.0 + cfg.dn_noise_trans) * cfg.dn_noise_scale
    rand_p = jax.random.uniform(kp, shape_p) + cfg.dn_offset_p
    sign_p = jax.random.randint(kps, shape_p, 0, 2).astype(jnp.float32) * 2 - 1
    pos_center = center[:, None] + sign_p * rand_p * diff_p

    # negatives (B, ngroups, nneg, gmax, 3)
    nneg = nsmp - 1
    shape_n = (b, ngroups, nneg, gmax, 3)
    diff_n = jnp.log(jnp.abs(center[:, None, None]) + 1.0)
    rand_n = jax.random.uniform(kn, shape_n) + cfg.dn_offset
    sign_n = jax.random.randint(kns, shape_n, 0, 2).astype(jnp.float32) * 2 - 1
    neg_center = center[:, None, None] + sign_n * rand_n * diff_n

    # per-group layout [pos, neg_1, ..., neg_{nneg}] along the slot dim
    all_center = jnp.concatenate(
        [pos_center[:, :, None], neg_center], axis=2)   # (B, grp, nsmp, gmax, 3)
    all_center = all_center.reshape(b, ngroups, nsmp * gmax, 3)
    slot_mask = jnp.tile(mask[:, None, None], (1, ngroups, nsmp, 1))
    slot_mask = slot_mask.reshape(b, ngroups, nsmp * gmax)

    # Hungarian matching of noised centers to GT centers per (sample, group)
    cost = jnp.sum(jnp.abs(all_center[..., None, :] - center[:, None, None]),
                   axis=-1)                              # (B, grp, S, gmax)
    cost = jnp.nan_to_num(cost, nan=100.0, posinf=100.0, neginf=-100.0)
    cost = jnp.where(slot_mask[..., None], cost, BIG_COST)
    cost = jnp.where(mask[:, None, None, :], cost, BIG_COST * 2)
    col_ok = jnp.broadcast_to(mask[:, None], cost.shape[:2] + (gmax,))
    row_for_col = hungarian_match(cost, col_ok)          # (B, grp, gmax)

    nslots = nsmp * gmax
    # scatter matched GT labels/boxes onto the matched slots; invalid columns
    # are routed to a dummy slot (index nslots) that is dropped afterwards
    cls_t = jnp.full((b, ngroups, nslots + 1), cfg.num_classes, jnp.int32)
    box_t = jnp.zeros((b, ngroups, nslots + 1, gt_boxes.shape[-1]))
    col_valid = jnp.broadcast_to(mask[:, None], (b, ngroups, gmax))
    bidx = jnp.arange(b)[:, None, None]
    gidx = jnp.arange(ngroups)[None, :, None]
    safe_rows = jnp.where(col_valid, row_for_col, nslots)
    cls_scatter = jnp.broadcast_to(labels[:, None], (b, ngroups, gmax))
    cls_t = cls_t.at[bidx, gidx, safe_rows].set(cls_scatter)
    box_bc = jnp.broadcast_to(boxes[:, None], (b, ngroups, gmax, boxes.shape[-1]))
    box_t = box_t.at[bidx, gidx, safe_rows].set(box_bc)
    cls_t = cls_t[:, :, :nslots]
    box_t = box_t[:, :, :nslots]
    bbox_mask = cls_t != cfg.num_classes

    # normalize + clamp reference points (farhead.py:379-380)
    lo = jnp.asarray(pc_range[:3])
    hi = jnp.asarray(pc_range[3:6])
    ref = jnp.clip((all_center - lo) / (hi - lo), 0.0, 1.0)
    ref = ref.reshape(b, ngroups * nslots, 3)
    valid = slot_mask.reshape(b, ngroups * nslots)
    ref = jnp.where(valid[..., None], ref, 0.0)

    num_tgt = jnp.float32(ngroups) * jnp.sum(mask)
    return {
        'ref_points': jax.lax.stop_gradient(ref),
        'valid': valid,
        'labels': cls_t.reshape(b, ngroups * nslots),
        'bbox_targets': box_t.reshape(b, ngroups * nslots, -1),
        'bbox_mask': bbox_mask.reshape(b, ngroups * nslots),
        'num_tgt': num_tgt,
    }
