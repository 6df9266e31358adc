"""FarHead set-prediction losses (reference: farhead.py:874-1221).

Per decoder layer: Hungarian match (focal cls cost + L1 box cost on the
normalized 8-dim code, hungarian_assigner_3d.py:29-91) -> focal cls loss
(weight 2.0) + weighted L1 box loss (weight 0.25), with cross-device
`reduce_mean` of the normalizers (farhead.py:1027-1037) realized as
`jax.lax.pmean` when running under a mesh axis.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import HeadConfig
from ..geometry import normalize_bbox
from .losses import sigmoid_focal_loss, weighted_l1
from .matching import BIG_COST, focal_cls_cost, hungarian_match, l1_bbox_cost


def _maybe_pmean(x, axis_name: Optional[str]):
    if axis_name is None:
        return x
    return jax.lax.pmean(x, axis_name)


def match_targets(cls_scores: jax.Array,      # (B, Q, ncls) logits
                  bbox_preds: jax.Array,      # (B, Q, code) (xyz metric)
                  query_valid: jax.Array,     # (B, Q)
                  gt_boxes: jax.Array,        # (B, G, >=7) metric
                  gt_labels: jax.Array,       # (B, G)
                  gt_mask: jax.Array,         # (B, G)
                  cfg: HeadConfig):
    """One layer's Hungarian assignment. Returns (labels (B,Q), bbox_targets
    (B,Q,code), bbox_mask (B,Q) positives, label_weights (B,Q))."""
    b, q, ncls = cls_scores.shape
    gt_norm = normalize_bbox(gt_boxes)

    def per_sample(cls_s, bbox_p, qv, gtn, gtl, gtm):
        cost = focal_cls_cost(cls_s, gtl, weight=cfg.loss_cls_weight,
                              alpha=cfg.focal_alpha, gamma=cfg.focal_gamma)
        cost = cost + l1_bbox_cost(bbox_p, gtn, weight=cfg.loss_bbox_weight)
        cost = jnp.nan_to_num(cost, nan=100.0, posinf=100.0, neginf=-100.0)
        cost = jnp.where(qv[:, None], cost, BIG_COST + 100.0)
        cost = jnp.where(gtm[None, :], cost, BIG_COST)
        return cost

    # normalized bbox pred for the cost: the head outputs metric xyz, but the
    # cost/loss operate on the normalized code where xyz stays metric
    # (normalize_bbox keeps centers metric; only sizes go log, yaw sin/cos) —
    # bbox_preds already are the code with metric xyz.
    cost = jax.vmap(per_sample)(cls_scores.astype(jnp.float32),
                                bbox_preds.astype(jnp.float32), query_valid,
                                gt_norm, gt_labels, gt_mask)
    row_for_col = hungarian_match(cost, gt_mask)           # (B, G)

    # scatter matched GT labels/boxes; invalid GT columns go to a dummy query
    # slot (index q) that is dropped, so they can't clobber real matches
    labels = jnp.full((b, q + 1), cfg.num_classes, jnp.int32)
    bbox_t = jnp.zeros((b, q + 1, gt_boxes.shape[-1]), jnp.float32)
    bidx = jnp.arange(b)[:, None]
    safe_rows = jnp.where(gt_mask, row_for_col, q)
    labels = labels.at[bidx, safe_rows].set(gt_labels)[:, :q]
    bbox_t = bbox_t.at[bidx, safe_rows].set(gt_boxes)[:, :q]
    bbox_mask = labels != cfg.num_classes
    label_weights = query_valid.astype(jnp.float32)
    return labels, bbox_t, bbox_mask, label_weights


def layer_loss(cls_scores, bbox_preds, labels, bbox_targets, bbox_mask,
               label_weights, cfg: HeadConfig, axis_name=None):
    """farhead.py:984-1050 — one decoder layer's focal + L1 loss."""
    num_pos = jnp.sum(bbox_mask.astype(jnp.float32))
    cls_avg = jnp.maximum(_maybe_pmean(num_pos, axis_name), 1.0)
    loss_cls = cfg.loss_cls_weight * sigmoid_focal_loss(
        cls_scores.astype(jnp.float32), labels, label_weights,
        cfg.num_classes, cfg.focal_alpha, cfg.focal_gamma) / cls_avg

    norm_t = normalize_bbox(bbox_targets)
    isfinite = jnp.all(jnp.isfinite(norm_t), axis=-1)
    cw = jnp.asarray(cfg.code_weights)
    w = (bbox_mask & isfinite).astype(jnp.float32)[..., None] * cw
    num_pos_r = jnp.maximum(_maybe_pmean(num_pos, axis_name), 1.0)
    loss_bbox = cfg.loss_bbox_weight * weighted_l1(
        bbox_preds.astype(jnp.float32)[..., :norm_t.shape[-1]],
        jnp.nan_to_num(norm_t), w) / num_pos_r
    return jnp.nan_to_num(loss_cls), jnp.nan_to_num(loss_bbox)


def farhead_loss(outs: Dict, gt_boxes, gt_labels, gt_mask,
                 dn: Optional[Dict], cfg: HeadConfig, axis_name=None
                 ) -> Dict[str, jax.Array]:
    """Full multi-layer loss incl. DN terms (farhead.py:1113-1221)."""
    all_cls = outs['all_cls_scores']       # (L, B, Q, ncls)
    all_bbox = outs['all_bbox_preds']      # (L, B, Q, code)
    qv = outs['query_valid']
    n_layers = all_cls.shape[0]
    losses = {}
    for lyr in range(n_layers):
        labels, bbox_t, bmask, lw = match_targets(
            all_cls[lyr], all_bbox[lyr], qv, gt_boxes, gt_labels, gt_mask, cfg)
        lc, lb = layer_loss(all_cls[lyr], all_bbox[lyr], labels, bbox_t,
                            bmask, lw, cfg, axis_name)
        tag = '' if lyr == n_layers - 1 else f'd{lyr}.'
        losses[f'{tag}loss_cls'] = lc
        losses[f'{tag}loss_bbox'] = lb

    if dn is not None and outs.get('dn_cls_scores') is not None:
        num_tgt = jnp.maximum(_maybe_pmean(dn['num_tgt'], axis_name), 1.0)
        dn_cls = outs['dn_cls_scores']
        dn_bbox = outs['dn_bbox_preds']
        norm_t = normalize_bbox(dn['bbox_targets'])
        isfinite = jnp.all(jnp.isfinite(norm_t), axis=-1)
        cw = jnp.asarray(cfg.code_weights)
        w = (dn['bbox_mask'] & isfinite & dn['valid']).astype(
            jnp.float32)[..., None] * cw
        lw = dn['valid'].astype(jnp.float32)
        for lyr in range(n_layers):
            lc = cfg.loss_cls_weight * sigmoid_focal_loss(
                dn_cls[lyr].astype(jnp.float32), dn['labels'], lw,
                cfg.num_classes, cfg.focal_alpha, cfg.focal_gamma) / num_tgt
            lb = cfg.loss_bbox_weight * weighted_l1(
                dn_bbox[lyr].astype(jnp.float32)[..., :norm_t.shape[-1]],
                jnp.nan_to_num(norm_t), w) / num_tgt
            tag = '' if lyr == n_layers - 1 else f'd{lyr}.'
            losses[f'{tag}dn_loss_cls'] = cfg.dn_weight * jnp.nan_to_num(lc)
            losses[f'{tag}dn_loss_bbox'] = cfg.dn_weight * jnp.nan_to_num(lb)
    return losses
