"""2D prior branch: YOLOX-style head + categorical depth net.

Reference: models/dense_heads/yolox_head.py (YOLOXHeadCustom) and
models/depth_predictor/depth_predictor.py.

TPU-first translation: the reference's dynamic, per-image proposal filter
(score threshold 0.1 + 3x3 max-pool local-NMS, yolox_head.py:426-458) becomes a
*static* per-sample top-K selection over all cameras and FPN levels with a
validity mask — see `select_proposals`. Downstream consumers (FarHead) carry
the mask through attention, matching and decoding.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import DepthNetConfig, Yolox2DConfig
from .layers import GroupNormConv, bias_init_with_prob


class ConvBNSwish(nn.Module):
    """ConvModule(conv-BN-Swish) used by the YOLOX towers (yolox_head.py:197-219).
    BatchNorm here is trainable (only the backbone runs norm_eval)."""
    features: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.features, (3, 3), padding='SAME', use_bias=False,
                    dtype=x.dtype, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=x.dtype, name='bn')(x)
        return nn.silu(x)


class DepthPredictor(nn.Module):
    """2x (3x3 conv + GN32 + ReLU) + 1x1 classifier -> num_bins+1 logits
    (depth_predictor.py:41-60), predicted on the stride-8 level."""
    cfg: DepthNetConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = 256
        for i in range(self.cfg.conv_layers):
            x = GroupNormConv(d, kernel=3, name=f'conv{i}')(x)
        return nn.Conv(self.cfg.num_depth_bins + 1, (1, 1), dtype=x.dtype,
                       name='classifier')(x)


class YoloxHead2D(nn.Module):
    """Per-level anchor-free 2D head (yolox_head.py:164-258): two stacked-conv
    towers (cls / reg) and 1x1 predictors for cls, box, objectness and
    centers2d offset. Owns the DepthPredictor (yolox_head.py:182-194)."""
    cfg: Yolox2DConfig
    depth_cfg: DepthNetConfig

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False
                 ) -> Dict[str, List[jax.Array]]:
        """feats: list of (BN, H_l, W_l, C) NHWC features per level.

        Returns dict of per-level NHWC prediction maps plus stride-8 depth
        logits."""
        c = self.cfg
        cls_scores, bbox_preds, objectnesses, centers2d = [], [], [], []
        cls_bias = nn.initializers.constant(bias_init_with_prob(0.01))
        for li, x in enumerate(feats):
            cf = x
            rf = x
            for si in range(c.stacked_convs):
                cf = ConvBNSwish(c.feat_channels, name=f'cls_tower{li}_{si}')(cf, train)
                rf = ConvBNSwish(c.feat_channels, name=f'reg_tower{li}_{si}')(rf, train)
            cls_scores.append(nn.Conv(c.num_classes, (1, 1), bias_init=cls_bias,
                                      dtype=cf.dtype, name=f'conv_cls{li}')(cf))
            bbox_preds.append(nn.Conv(4, (1, 1), dtype=rf.dtype,
                                      name=f'conv_reg{li}')(rf))
            objectnesses.append(nn.Conv(1, (1, 1), bias_init=cls_bias,
                                        dtype=rf.dtype, name=f'conv_obj{li}')(rf))
            centers2d.append(nn.Conv(2, (1, 1), dtype=rf.dtype,
                                     name=f'conv_centers2d{li}')(rf))
        # depth on the stride-8 level (reg_depth_level='p3', yolox_head.py:300-317)
        depth_logit = DepthPredictor(self.depth_cfg, name='depthnet')(feats[0])
        return {
            'cls_scores': cls_scores,          # L x (BN, H, W, num_classes)
            'bbox_preds': bbox_preds,          # L x (BN, H, W, 4)
            'objectnesses': objectnesses,      # L x (BN, H, W, 1)
            'centers2d_offsets': centers2d,    # L x (BN, H, W, 2)
            'depth_logit': depth_logit,        # (BN, H8, W8, D+1)
        }


def make_priors(level_hw: Sequence[Tuple[int, int]],
                strides: Sequence[int]) -> jax.Array:
    """MlvlPointGenerator(strides, offset=0) priors with stride
    (yolox_head.py:133,403): (sum(HW), 4) of (x, y, stride, stride)."""
    priors = []
    for (h, w), s in zip(level_hw, strides):
        xs = jnp.arange(w, dtype=jnp.float32) * s
        ys = jnp.arange(h, dtype=jnp.float32) * s
        x, y = jnp.meshgrid(xs, ys, indexing='xy')
        ss = jnp.full_like(x, float(s))
        priors.append(jnp.stack([x.ravel(), y.ravel(), ss.ravel(), ss.ravel()],
                                axis=-1))
    return jnp.concatenate(priors, axis=0)


def decode_boxes(priors: jax.Array, bbox_preds: jax.Array) -> jax.Array:
    """YOLOX box decode (yolox_head.py:491-501): (..., 4) -> xyxy."""
    xys = bbox_preds[..., :2] * priors[:, 2:] + priors[:, :2]
    whs = jnp.exp(bbox_preds[..., 2:]) * priors[:, 2:]
    tl = xys - whs / 2
    br = xys + whs / 2
    return jnp.concatenate([tl, br], axis=-1)


def xyxy_to_cxcywh(b: jax.Array) -> jax.Array:
    cx = (b[..., 0:1] + b[..., 2:3]) / 2
    cy = (b[..., 1:2] + b[..., 3:4]) / 2
    wh = b[..., 2:4] - b[..., 0:2]
    return jnp.concatenate([cx, cy, wh], axis=-1)


def flatten_levels(maps: Sequence[jax.Array]) -> jax.Array:
    """L x (BN, H, W, C) -> (BN, sum(HW), C)."""
    bn = maps[0].shape[0]
    return jnp.concatenate(
        [m.reshape(bn, -1, m.shape[-1]) for m in maps], axis=1)


def select_proposals(outs: Dict[str, List[jax.Array]],
                     batch: int,
                     num_cams: int,
                     strides: Sequence[int],
                     k: int,
                     threshold: float) -> Dict[str, jax.Array]:
    """Static top-K proposal selection (replaces yolox_head.py:424-467).

    Scoring matches the reference: per-level sample weight
    sigmoid(obj) * sigmoid(max-class logit), kept only at 3x3 local maxima,
    then thresholded — except selection is a fixed per-*sample* top-K over all
    cameras and levels with `valid = score > threshold`.

    Returns (per batch sample):
      boxes_cxcywh (B, K, 4) in padded-image pixels, scores (B, K, 1),
      cam_idx (B, K) int32, flat_idx (B, K) int32 index into sum(HW) of the
      camera's flattened levels, valid (B, K) bool.
    """
    sw_levels = []
    for cls_map, obj_map in zip(outs['cls_scores'], outs['objectnesses']):
        sw = jax.nn.sigmoid(obj_map[..., 0]) * jax.nn.sigmoid(
            jnp.max(cls_map, axis=-1))                       # (BN, H, W)
        local_max = nn.max_pool(sw[..., None], (3, 3), strides=(1, 1),
                                padding='SAME')[..., 0]
        sw = sw * (sw == local_max).astype(sw.dtype)
        sw_levels.append(sw.reshape(sw.shape[0], -1))
    sample_weight = jnp.concatenate(sw_levels, axis=1)       # (BN, sumHW)

    level_hw = [m.shape[1:3] for m in outs['cls_scores']]
    priors = make_priors(level_hw, strides)
    flat_preds = flatten_levels(outs['bbox_preds'])           # (BN, sumHW, 4)
    boxes = xyxy_to_cxcywh(decode_boxes(priors, flat_preds))  # (BN, sumHW, 4)

    sum_hw = sample_weight.shape[1]
    sw = sample_weight.reshape(batch, num_cams * sum_hw)
    scores, idx = jax.lax.top_k(sw, k)                        # (B, K)
    cam_idx = idx // sum_hw
    flat_idx = idx % sum_hw
    boxes = boxes.reshape(batch, num_cams * sum_hw, 4)
    sel_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    valid = scores > threshold
    return {
        'boxes': sel_boxes,                                   # (B, K, 4) cxcywh
        'scores': scores[..., None],                          # (B, K, 1)
        'cam_idx': cam_idx,
        'flat_idx': flat_idx,
        'valid': valid,
    }
