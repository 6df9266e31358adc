"""Kernel-free geometry & codec core (pure jnp).

One shared implementation for the math that the reference repeats in several places:
  * LID depth binning — farhead.py:521-531, ddn_loss.py:96-132, custom_pipeline.py:501-537
  * box normalize/denormalize — core/bbox/util.py:4-52
  * sine positional embeddings — models/utils/positional_encoding.py:13-80
  * ego-pose alignment of reference points — models/utils/misc.py:193-202
  * per-stride pixel-center location grids — models/utils/misc.py:57-84
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def inverse_sigmoid(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Numerically-clamped logit (mmdet transformer.inverse_sigmoid)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1) - jnp.log(x2)


# ---------------------------------------------------------------------------
# LID (linear-increasing discretisation) depth binning
# ---------------------------------------------------------------------------

def lid_bin_size(depth_min: float, depth_max: float, num_bins: int) -> float:
    return 2.0 * (depth_max - depth_min) / (num_bins * (1 + num_bins))


def lid_bin_to_depth(indices: jax.Array, depth_min: float, depth_max: float,
                     num_bins: int) -> jax.Array:
    """Bin index -> metric depth (farhead.py:524-527).

    depth = depth_min + bin_size/8 * ((i/0.5 + 1)^2 - 1)
    """
    bs = lid_bin_size(depth_min, depth_max, num_bins)
    i = indices.astype(jnp.float32)
    return depth_min + bs / 8.0 * (jnp.square(i / 0.5 + 1.0) - 1.0)


def lid_depth_to_bin(depth: jax.Array, depth_min: float, depth_max: float,
                     num_bins: int, target: bool = False) -> jax.Array:
    """Metric depth -> (float or clamped int) LID bin index (ddn_loss.py:115-132).

    With target=True, out-of-range / non-finite depths map to bin `num_bins`
    (the overflow class), matching bin_depths(..., target=True).
    """
    bs = lid_bin_size(depth_min, depth_max, num_bins)
    indices = -0.5 + 0.5 * jnp.sqrt(1.0 + 8.0 * (depth - depth_min) / bs)
    if target:
        bad = (indices < 0) | (indices > num_bins) | ~jnp.isfinite(indices)
        indices = jnp.where(bad, jnp.float32(num_bins), indices)
        return indices.astype(jnp.int32)
    return indices


def lid_depth_to_bin_floor(depth: jax.Array, depth_min: float, depth_max: float,
                           num_bins: int) -> jax.Array:
    """depth -> truncated int bin (farhead.py:528-531, `inverse=True`)."""
    idx = lid_depth_to_bin(depth, depth_min, depth_max, num_bins, target=False)
    return idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Box codec: 8/10-dim normalized code (x,y,z, logw,logl,logh, sin,cos[,vx,vy])
# ---------------------------------------------------------------------------

def normalize_bbox(bboxes: jax.Array) -> jax.Array:
    """Metric (cx,cy,cz,w,l,h,yaw[,vx,vy]) -> normalized code (util.py:4-23)."""
    cx, cy, cz = bboxes[..., 0:1], bboxes[..., 1:2], bboxes[..., 2:3]
    w = jnp.log(bboxes[..., 3:4])
    l = jnp.log(bboxes[..., 4:5])
    h = jnp.log(bboxes[..., 5:6])
    rot = bboxes[..., 6:7]
    parts = [cx, cy, cz, w, l, h, jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        parts += [bboxes[..., 7:8], bboxes[..., 8:9]]
    return jnp.concatenate(parts, axis=-1)


def denormalize_bbox(code: jax.Array) -> jax.Array:
    """Normalized code -> metric (cx,cy,cz,w,l,h,yaw[,vx,vy]) (util.py:25-52)."""
    rot = jnp.arctan2(code[..., 6:7], code[..., 7:8])
    cx, cy, cz = code[..., 0:1], code[..., 1:2], code[..., 2:3]
    w = jnp.exp(code[..., 3:4])
    l = jnp.exp(code[..., 4:5])
    h = jnp.exp(code[..., 5:6])
    parts = [cx, cy, cz, w, l, h, rot]
    if code.shape[-1] > 8:
        parts += [code[..., 8:9], code[..., 9:10]]
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# Sine positional embeddings
# ---------------------------------------------------------------------------

def _sine_embed(pos: jax.Array, num_pos_feats: int, temperature: float) -> jax.Array:
    """pos (..., ) -> (..., num_pos_feats) interleaved sin/cos."""
    scale = 2.0 * math.pi
    pos = pos * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
    x = pos[..., None] / dim_t
    emb = jnp.stack([jnp.sin(x[..., 0::2]), jnp.cos(x[..., 1::2])], axis=-1)
    return emb.reshape(*emb.shape[:-2], num_pos_feats)


def pos2posemb3d(pos: jax.Array, num_pos_feats: int = 128,
                 temperature: float = 10000.0) -> jax.Array:
    """(..., 3) normalized xyz -> (..., 3*num_pos_feats) [y, x, z] order
    (positional_encoding.py:13-25)."""
    ex = _sine_embed(pos[..., 0], num_pos_feats, temperature)
    ey = _sine_embed(pos[..., 1], num_pos_feats, temperature)
    ez = _sine_embed(pos[..., 2], num_pos_feats, temperature)
    return jnp.concatenate([ey, ex, ez], axis=-1)


def pos2posemb1d(pos: jax.Array, num_pos_feats: int = 256,
                 temperature: float = 10000.0) -> jax.Array:
    """(..., 1) -> (..., num_pos_feats) (positional_encoding.py:27-36)."""
    return _sine_embed(pos[..., 0], num_pos_feats, temperature)


def nerf_positional_encoding(x: jax.Array, num_encoding_functions: int = 6) -> jax.Array:
    """NeRF-style log-sampled sin/cos bands, no input passthrough
    (positional_encoding.py:38-80): (..., D) -> (..., D*2*num_fn)."""
    freqs = 2.0 ** jnp.linspace(0.0, num_encoding_functions - 1,
                                num_encoding_functions, dtype=x.dtype)
    out = []
    for f in freqs:  # static unroll, 6 bands
        out.append(jnp.sin(x * f))
        out.append(jnp.cos(x * f))
    return jnp.concatenate(out, axis=-1)


# ---------------------------------------------------------------------------
# SE3 / projection helpers
# ---------------------------------------------------------------------------

def transform_points(points: jax.Array, matrix: jax.Array) -> jax.Array:
    """Apply homogeneous 4x4 `matrix` (..., 4, 4) to `points` (..., N, 3)
    (misc.py:193-202 transform_reference_points, reverse=False).

    matrix batches broadcast against the leading dims of points.
    """
    ones = jnp.ones_like(points[..., :1])
    pts = jnp.concatenate([points, ones], axis=-1)          # (..., N, 4)
    out = jnp.einsum('...ij,...nj->...ni', matrix, pts)
    return out[..., :3]


def unproject_to_lidar(uv: jax.Array, depth: jax.Array, img2lidar: jax.Array,
                       eps: float = 1e-5) -> jax.Array:
    """(u,v) pixels + metric depth -> 3D points in the ego/lidar frame
    (farhead.py:792-811): homogeneous (u*d, v*d, d, 1) through img2lidar.

    uv: (..., 2); depth: (..., 1); img2lidar: (..., 4, 4) -> (..., 3)
    """
    d = jnp.maximum(depth, eps)
    coords = jnp.concatenate([uv * d, depth, jnp.ones_like(depth)], axis=-1)
    out = jnp.einsum('...ij,...j->...i', img2lidar, coords)
    return out[..., :3]


def project_to_image(points: jax.Array, lidar2img: jax.Array,
                     eps: float = 1e-5) -> Tuple[jax.Array, jax.Array]:
    """3D ego-frame points -> pixel coords (detr3d_transformer.py:547-552).

    points: (..., 3); lidar2img: (..., 4, 4).
    Returns (uv (..., 2), depth (..., 1)). uv = xy / clamp(z, eps).
    """
    ones = jnp.ones_like(points[..., :1])
    pts = jnp.concatenate([points, ones], axis=-1)
    cam = jnp.einsum('...ij,...j->...i', lidar2img, pts)
    depth = cam[..., 2:3]
    uv = cam[..., :2] / jnp.maximum(depth, eps)
    return uv, depth


def normalize_to_pc_range(points: jax.Array, pc_range) -> jax.Array:
    """Metric xyz -> [0,1]^3 within the point-cloud range."""
    lo = jnp.asarray(pc_range[:3], dtype=points.dtype)
    hi = jnp.asarray(pc_range[3:6], dtype=points.dtype)
    return (points - lo) / (hi - lo)


def denormalize_from_pc_range(points: jax.Array, pc_range) -> jax.Array:
    lo = jnp.asarray(pc_range[:3], dtype=points.dtype)
    hi = jnp.asarray(pc_range[3:6], dtype=points.dtype)
    return points * (hi - lo) + lo


def location_grid(h: int, w: int, stride: int, pad_h: int, pad_w: int) -> jax.Array:
    """Normalized pixel-center grid (misc.py:57-84): (h, w, 2) of (x, y) in [0,1].

    x = (col*stride + stride//2)/pad_w, y likewise — matches the reference's
    integer `stride // 2` offset.
    """
    xs = (jnp.arange(w, dtype=jnp.float32) * stride + stride // 2) / pad_w
    ys = (jnp.arange(h, dtype=jnp.float32) * stride + stride // 2) / pad_h
    x, y = jnp.meshgrid(xs, ys, indexing='xy')
    return jnp.stack([x, y], axis=-1)


def yaw_to_quat_wxyz(yaw: jax.Array) -> jax.Array:
    """Yaw about +z -> (w,x,y,z) quaternion (av2_utils yaw_to_quat)."""
    half = yaw * 0.5
    zeros = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1)
