"""YOLOX 2D head losses with a masked, static-shape SimOTA assigner.

Reference: yolox_head.py:521-760 (loss + _get_target_single with mmdet's
SimOTAAssigner) and the DDN depth loss (yolox_head.py:639-672).

SimOTA translation notes (mmdet SimOTAAssigner.assign + dynamic_k_matching):
  * candidate validity = prior center inside a GT box OR inside the 2.5-stride
    center region; pairs outside box-AND-center get +INF cost.
  * cost = BCE(sqrt(cls_prob), onehot) + 3 * (-log iou) + INF * invalid
  * dynamic_k per GT = clamp(int(sum of top-10 IoUs), 1) realized here as a
    threshold on the k-th smallest cost per GT (ties may differ from the
    reference's topk — an acceptable training-time deviation).
  * a prior matched to several GTs keeps the min-cost one.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import Yolox2DConfig
from .losses import (bbox_overlaps_xyxy, bce_logits,
                     binary_cross_entropy_with_probs, ddn_depth_loss,
                     iou_loss_square)

INF = 1e8


def simota_assign(cls_logits: jax.Array,     # (P, ncls)
                  obj_logits: jax.Array,     # (P,)
                  priors: jax.Array,         # (P, 4) cx,cy,stride,stride
                  decoded: jax.Array,        # (P, 4) xyxy
                  gt_boxes: jax.Array,       # (G, 4) xyxy
                  gt_labels: jax.Array,      # (G,)
                  gt_mask: jax.Array,        # (G,)
                  cfg: Yolox2DConfig):
    """Returns (matched_gt (P,) int32 index or -1, matched_iou (P,))."""
    p = priors.shape[0]
    g = gt_boxes.shape[0]
    # centers with the 0.5-stride offset used for assignment (yolox_head.py:717)
    cx = priors[:, 0] + priors[:, 2] * 0.5
    cy = priors[:, 1] + priors[:, 3] * 0.5
    in_box = ((cx[:, None] > gt_boxes[None, :, 0]) &
              (cx[:, None] < gt_boxes[None, :, 2]) &
              (cy[:, None] > gt_boxes[None, :, 1]) &
              (cy[:, None] < gt_boxes[None, :, 3]))
    gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    r = cfg.center_radius
    in_ct = ((cx[:, None] > gcx[None] - r * priors[:, 2:3]) &
             (cx[:, None] < gcx[None] + r * priors[:, 2:3]) &
             (cy[:, None] > gcy[None] - r * priors[:, 3:4]) &
             (cy[:, None] < gcy[None] + r * priors[:, 3:4]))
    valid_prior = jnp.any(in_box | in_ct, axis=1)
    both = in_box & in_ct

    ious = bbox_overlaps_xyxy(decoded, gt_boxes)            # (P, G)
    ious = jnp.where(gt_mask[None, :], ious, 0.0)
    iou_cost = -jnp.log(ious + 1e-8)
    probs = jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(obj_logits)[:, None]
    onehot = jax.nn.one_hot(gt_labels, cfg.num_classes)      # (G, ncls)
    cls_cost = binary_cross_entropy_with_probs(
        jnp.sqrt(jnp.clip(probs, 1e-12, 1.0))[:, None, :],
        onehot[None, :, :]).sum(-1)                          # (P, G)
    cost = cls_cost + 3.0 * iou_cost
    cost = jnp.where(both, cost, cost + INF)
    cost = jnp.where(valid_prior[:, None], cost, cost + INF)
    cost = jnp.where(gt_mask[None, :], cost, INF * 3)

    # dynamic k: sum of top-10 ious per gt (masked to valid candidate pairs)
    cand_ious = jnp.where(both & valid_prior[:, None], ious, 0.0)
    topk_ious = -jax.lax.top_k(-(-cand_ious.T), min(cfg.candidate_topk, p))[0]
    topk_ious = jax.lax.top_k(cand_ious.T, min(cfg.candidate_topk, p))[0]
    dynamic_k = jnp.clip(jnp.sum(topk_ious, axis=1).astype(jnp.int32), 1,
                         cfg.candidate_topk)                 # (G,)
    # threshold = k-th smallest cost per gt
    sorted_cost = jnp.sort(cost, axis=0)                     # (P, G)
    kth = jnp.take_along_axis(sorted_cost, (dynamic_k - 1)[None, :],
                              axis=0)[0]                     # (G,)
    matching = (cost <= kth[None, :]) & (cost < INF)         # (P, G)
    # resolve priors matched to multiple GTs: keep min cost
    best_gt = jnp.argmin(jnp.where(matching, cost, INF), axis=1)
    any_match = jnp.any(matching, axis=1)
    matched_gt = jnp.where(any_match, best_gt, -1)
    matched_iou = jnp.where(any_match,
                            jnp.take_along_axis(ious, best_gt[:, None],
                                                axis=1)[:, 0], 0.0)
    return matched_gt, matched_iou


def yolox_loss(outs2d: Dict, priors: jax.Array,
               gt_boxes2d: jax.Array,       # (BN, G, 4) xyxy padded pixels
               gt_labels2d: jax.Array,      # (BN, G)
               gt_centers2d: jax.Array,     # (BN, G, 2)
               gt_mask2d: jax.Array,        # (BN, G)
               gt_depth_bins: jax.Array,    # (BN, H8*W8) int LID targets
               gt_depth_fg: jax.Array,      # (BN, H8*W8) bool fg mask
               cfg: Yolox2DConfig, axis_name: Optional[str] = None
               ) -> Dict[str, jax.Array]:
    """Full 2D branch loss (yolox_head.py:521-674)."""
    from .losses3d import _maybe_pmean
    from .losses import weighted_l1
    from ..models.heads2d import decode_boxes, flatten_levels

    cls = flatten_levels(outs2d['cls_scores'])      # (BN, P, ncls)
    reg = flatten_levels(outs2d['bbox_preds'])      # (BN, P, 4)
    obj = flatten_levels(outs2d['objectnesses'])[..., 0]
    ctr = flatten_levels(outs2d['centers2d_offsets'])
    decoded = decode_boxes(priors, reg)

    matched_gt, matched_iou = jax.vmap(
        lambda c, o, d, gb, gl, gm: simota_assign(
            c.astype(jnp.float32), o.astype(jnp.float32),
            priors, d.astype(jnp.float32), gb, gl, gm, cfg))(
        cls, obj, decoded, gt_boxes2d, gt_labels2d, gt_mask2d)

    pos = matched_gt >= 0                           # (BN, P)
    num_pos = jnp.sum(pos.astype(jnp.float32))
    num_total = jnp.maximum(_maybe_pmean(num_pos, axis_name), 1.0)

    safe_gt = jnp.maximum(matched_gt, 0)
    tgt_box = jnp.take_along_axis(gt_boxes2d, safe_gt[..., None], axis=1)
    tgt_lbl = jnp.take_along_axis(gt_labels2d, safe_gt, axis=1)
    tgt_ctr = jnp.take_along_axis(gt_centers2d, safe_gt[..., None], axis=1)

    posf = pos.astype(jnp.float32)
    # IoU-aware cls target (yolox_head.py:731-732)
    cls_t = jax.nn.one_hot(tgt_lbl, cfg.num_classes) * matched_iou[..., None]
    loss_cls = jnp.sum(
        bce_logits(cls.astype(jnp.float32), cls_t) * posf[..., None]
    ) / num_total * cfg.loss_cls_weight
    loss_obj = jnp.sum(
        bce_logits(obj.astype(jnp.float32), posf)) / num_total * cfg.loss_obj_weight
    loss_iou = jnp.sum(
        iou_loss_square(decoded.astype(jnp.float32), tgt_box) * posf
    ) / num_total * cfg.loss_bbox_weight
    # L1 on the raw reg code (yolox_head.py:751-756)
    gt_cx = (tgt_box[..., 0:1] + tgt_box[..., 2:3]) / 2
    gt_cy = (tgt_box[..., 1:2] + tgt_box[..., 3:4]) / 2
    gt_w = tgt_box[..., 2:3] - tgt_box[..., 0:1]
    gt_h = tgt_box[..., 3:4] - tgt_box[..., 1:2]
    l1_t = jnp.concatenate([
        (gt_cx - priors[None, :, 0:1]) / priors[None, :, 2:3],
        (gt_cy - priors[None, :, 1:2]) / priors[None, :, 3:4],
        jnp.log(gt_w / priors[None, :, 2:3] + 1e-8),
        jnp.log(gt_h / priors[None, :, 3:4] + 1e-8)], axis=-1)
    loss_l1 = weighted_l1(reg.astype(jnp.float32), jnp.nan_to_num(l1_t),
                          posf[..., None]) / num_total * cfg.loss_l1_weight
    ctr_t = (tgt_ctr - priors[None, :, :2]) / priors[None, :, 2:]
    loss_ctr = weighted_l1(ctr.astype(jnp.float32), jnp.nan_to_num(ctr_t),
                           posf[..., None]) / num_total * cfg.loss_centers2d_weight

    dl = outs2d['depth_logit']
    loss_depth = ddn_depth_loss(
        dl.reshape(dl.shape[0], -1, dl.shape[-1]).astype(jnp.float32),
        gt_depth_bins, gt_depth_fg, cfg.ddn_fg_weight, cfg.ddn_bg_weight,
        cfg.ddn_alpha, cfg.ddn_gamma) * cfg.loss_depth_weight

    return {'enc_loss_cls': loss_cls, 'enc_loss_obj': loss_obj,
            'enc_loss_iou': loss_iou, 'enc_loss_bbox': loss_l1,
            'enc_loss_centers2d': loss_ctr, 'loss_depth': loss_depth}
