"""Far3D top-level detector (reference: models/detectors/far3d.py).

Orchestration per frame: [grid-mask aug] -> VoVNet backbone -> FPN ->
reshape per level -> YOLOX 2D head + depth net -> static top-K proposal
selection -> FarHead (DN / 2D->3D lifting / temporal decoder) -> outputs.

Everything is one flax module so a single `init`/`apply` covers the whole
network; the temporal memory is an explicit input/output (TemporalState).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Far3DConfig
from .farhead import FarHead, TemporalState
from .heads2d import YoloxHead2D, select_proposals
from .vovnet import FPN, VoVNet


def level_shapes(cfg: Far3DConfig) -> Tuple[Tuple[int, int], ...]:
    # successive SAME-padded stride-2 stages => ceil division per level
    h, w = cfg.data.input_hw
    return tuple((-(-h // s), -(-w // s)) for s in cfg.strides)


class Far3D(nn.Module):
    cfg: Far3DConfig

    @nn.compact
    def __call__(self,
                 images: jax.Array,            # (B, N, H, W, 3) normalized BGR
                 lidar2img: jax.Array,         # (B, N, 4, 4)
                 intrinsics: jax.Array,        # (B, N, 4, 4)
                 extrinsics: jax.Array,        # (B, N, 4, 4)
                 state: TemporalState,
                 prev_exists: jax.Array,       # (B,)
                 timestamp: jax.Array,         # (B,)
                 ego_pose: jax.Array,          # (B, 4, 4)
                 ego_pose_inv: jax.Array,      # (B, 4, 4)
                 gt_depth_bins: Optional[jax.Array] = None,   # (B, N, H8*W8)
                 dn_ref_points: Optional[jax.Array] = None,
                 dn_valid: Optional[jax.Array] = None,
                 use_gt_depth: bool = False,
                 train: bool = False,
                 quant_backbone: Optional[Dict] = None) -> Dict[str, Any]:
        cfg = self.cfg
        b, n, h, w, _ = images.shape
        shapes = level_shapes(cfg)

        if jnp.issubdtype(images.dtype, jnp.integer):
            # uint8 transport (4x less host->device traffic); normalize on
            # device — the fold into the first conv is free for XLA
            mean = jnp.asarray(cfg.data.img_mean, jnp.float32)
            std = jnp.asarray(cfg.data.img_std, jnp.float32)
            images = ((images.astype(jnp.float32) - mean) / std).astype(
                jnp.bfloat16)
        x = images.reshape(b * n, h, w, 3)
        if quant_backbone is not None:
            # int8 PTQ serving path (ops/quant.py): pass the quantized tree
            # as a call argument, never a closure constant (CLAUDE.md)
            from ..ops.quant import quant_vovnet_forward, quantize_input
            stages = quant_vovnet_forward(
                cfg.backbone, quant_backbone,
                quantize_input(x, quant_backbone['s0']))
        else:
            stages = VoVNet(cfg.backbone, name='backbone')(x)
        feats = FPN(cfg.neck, name='neck')(stages)       # 4 x (BN, Hl, Wl, C)

        outs2d = YoloxHead2D(cfg.roi2d, cfg.depthnet, name='roi_head')(
            feats, train=train)
        proposals = select_proposals(outs2d, b, n, cfg.strides,
                                     cfg.roi2d.num_proposals_2d,
                                     cfg.roi2d.threshold_score)
        dl = outs2d['depth_logit']
        depth_probs = jax.nn.softmax(dl, axis=-1).reshape(
            b, n, -1, dl.shape[-1])

        feat_flatten = jnp.concatenate(
            [f.reshape(b * n, -1, f.shape[-1]) for f in feats], axis=1)

        head_out = FarHead(cfg.head, cfg.decoder, cfg.deform, cfg.depthnet,
                           cfg.pc_range, shapes, cfg.data.input_hw,
                           cfg.roi2d.threshold_score, name='pts_head')(
            feat_flatten, lidar2img, intrinsics, extrinsics, state,
            prev_exists, timestamp, ego_pose, ego_pose_inv,
            proposals=proposals, depth_probs=depth_probs,
            gt_depth_bins=gt_depth_bins, dn_ref_points=dn_ref_points,
            dn_valid=dn_valid, use_gt_depth=use_gt_depth,
            deterministic=not train)

        head_out['outs2d'] = outs2d
        head_out['proposals'] = proposals
        return head_out


def decode_detections(cls_scores: jax.Array, bbox_preds: jax.Array,
                      query_valid: jax.Array, cfg: Far3DConfig
                      ) -> Dict[str, jax.Array]:
    """NMS-free decode for the Far3D head (config-object wrapper around
    `decode_boxes`)."""
    return decode_boxes(cls_scores, bbox_preds, query_valid,
                        cfg.head.max_decode_num, cfg.head.post_center_range)


def decode_boxes(cls_scores: jax.Array, bbox_preds: jax.Array,
                 query_valid: jax.Array, max_decode_num: int,
                 post_center_range) -> Dict[str, jax.Array]:
    """NMS-free decode (core/bbox/coders/nms_free_coder.py:39-91): flat top-K
    over (query x class) sigmoid scores, gravity-center z shift, post-range
    mask returned as a validity flag (static shapes). Shared by the Far3D
    and StreamPETR heads (the latter's 10-dim code adds velocity).

    cls_scores: (B, Q, ncls) last-layer logits; bbox_preds: (B, Q, code).
    Returns boxes (B, K, 9) [x,y,z(bottom),w,l,h,yaw,vx,vy], scores (B, K),
    labels (B, K), valid (B, K).
    """
    from ..geometry import denormalize_bbox
    b, q, ncls = cls_scores.shape
    scores = jax.nn.sigmoid(cls_scores)
    scores = jnp.where(query_valid[..., None], scores, -1.0)
    flat = scores.reshape(b, q * ncls)
    top_scores, idx = jax.lax.top_k(flat, max_decode_num)
    labels = idx % ncls
    qidx = idx // ncls
    code = jnp.take_along_axis(bbox_preds, qidx[..., None], axis=1)
    # bbox_preds xyz are already metric (denormalized in the head); sizes/yaw
    # still in log/sincos code
    boxes = denormalize_bbox(code.astype(jnp.float32))
    if boxes.shape[-1] == 7:
        boxes = jnp.concatenate(
            [boxes, jnp.zeros((*boxes.shape[:-1], 2), boxes.dtype)], axis=-1)
    # gravity center -> bottom center (farhead.py:1240)
    boxes = boxes.at[..., 2].add(-0.5 * boxes[..., 5])
    pcr = jnp.asarray(post_center_range)
    center = code[..., :3]
    in_range = jnp.all(center >= pcr[:3], -1) & jnp.all(center <= pcr[3:6], -1)
    valid = in_range & (top_scores > 0)
    return {'boxes': boxes, 'scores': top_scores, 'labels': labels,
            'valid': valid, 'query_idx': qidx}
