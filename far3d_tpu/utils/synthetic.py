"""Synthetic data generation for tests, benchmarks and the dry-run entrypoints.

Produces geometrically-consistent fake frames: pinhole cameras in a ring,
3D boxes inside the pc range, their 2D projections, and LID-binned instance
depth maps — shaped exactly like the real AV2 pipeline output.
"""

from __future__ import annotations

import numpy as np

from ..config import Far3DConfig


def ring_cameras(n: int, h: int, w: int, fov_deg: float = 70.0):
    """n pinhole cameras looking outward in a ring (ego frame: x fwd, y left,
    z up). Returns (intrinsics (n,4,4), extrinsics (n,4,4) = ego->cam)."""
    f = w / (2 * np.tan(np.radians(fov_deg) / 2))
    intr = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    intr[:, 0, 0] = f
    intr[:, 1, 1] = f
    intr[:, 0, 2] = w / 2
    intr[:, 1, 2] = h / 2
    extr = np.zeros((n, 4, 4), np.float32)
    for i in range(n):
        yaw = 2 * np.pi * i / n
        fwd = np.array([np.cos(yaw), np.sin(yaw), 0.0])   # camera optical axis
        left = np.array([-np.sin(yaw), np.cos(yaw), 0.0])
        up = np.array([0.0, 0.0, 1.0])
        # camera frame: x right, y down, z forward
        rot = np.stack([-left, -up, fwd], axis=0)
        extr[i, :3, :3] = rot
        extr[i, 3, 3] = 1.0
    return intr, extr


def synthetic_batch(cfg: Far3DConfig, batch: int = 1, seed: int = 0,
                    as_dict: bool = False):
    """Build a TrainBatch of plausible fake data."""
    from ..train.step import TrainBatch
    rng = np.random.RandomState(seed)
    n = cfg.data.num_cams
    h, w = cfg.data.input_hw
    g = cfg.data.max_gt
    g2 = cfg.data.max_gt_2d
    h8 = h // cfg.depthnet.stride
    w8 = w // cfg.depthnet.stride

    intr, extr = ring_cameras(n, h, w)
    lidar2img = np.einsum('nij,njk->nik', intr, extr)
    images = rng.randn(batch, n, h, w, 3).astype(np.float32)

    lo = np.asarray(cfg.pc_range[:3])
    hi = np.asarray(cfg.pc_range[3:6])
    centers = rng.uniform(lo, hi, size=(batch, g, 3)).astype(np.float32)
    sizes = rng.uniform(0.5, 4.0, size=(batch, g, 3)).astype(np.float32)
    yaw = rng.uniform(-np.pi, np.pi, size=(batch, g, 1)).astype(np.float32)
    gt_boxes = np.concatenate([centers, sizes, yaw], axis=-1)
    n_gt = rng.randint(1, g + 1, size=(batch,))
    gt_mask = np.arange(g)[None] < n_gt[:, None]
    gt_labels = rng.randint(0, cfg.num_classes, size=(batch, g))

    # project GT centers into cameras for 2D boxes / depth maps
    gt_boxes2d = np.zeros((batch, n, g2, 4), np.float32)
    gt_labels2d = np.zeros((batch, n, g2), np.int64)
    gt_centers2d = np.zeros((batch, n, g2, 2), np.float32)
    gt_mask2d = np.zeros((batch, n, g2), bool)
    depth_bins = np.full((batch, n, h8 * w8), cfg.depthnet.num_depth_bins,
                         np.int32)
    depth_fg = np.zeros((batch, n, h8 * w8), bool)
    bs = 2 * (cfg.depthnet.depth_max - cfg.depthnet.depth_min) / (
        cfg.depthnet.num_depth_bins * (1 + cfg.depthnet.num_depth_bins))
    for b in range(batch):
        for cam in range(n):
            cnt = 0
            for gi in range(int(n_gt[b])):
                pt = np.concatenate([centers[b, gi], [1.0]])
                uvd = lidar2img[cam] @ pt
                if uvd[2] < 1.0:
                    continue
                u, v = uvd[0] / uvd[2], uvd[1] / uvd[2]
                if not (0 <= u < w and 0 <= v < h) or cnt >= g2:
                    continue
                bw = 40.0 * rng.rand() + 8
                bh = 30.0 * rng.rand() + 8
                gt_boxes2d[b, cam, cnt] = [max(u - bw, 0), max(v - bh, 0),
                                           min(u + bw, w - 1), min(v + bh, h - 1)]
                gt_centers2d[b, cam, cnt] = [u, v]
                gt_labels2d[b, cam, cnt] = gt_labels[b, gi]
                gt_mask2d[b, cam, cnt] = True
                # paint instance depth (LID bin) on the stride-8 grid
                d = uvd[2]
                idx = -0.5 + 0.5 * np.sqrt(
                    1 + 8 * (d - cfg.depthnet.depth_min) / bs)
                idx = int(np.clip(idx, 0, cfg.depthnet.num_depth_bins))
                u8a, v8a = int(gt_boxes2d[b, cam, cnt, 0] // 8), int(
                    gt_boxes2d[b, cam, cnt, 1] // 8)
                u8b = int(np.ceil(gt_boxes2d[b, cam, cnt, 2] / 8))
                v8b = int(np.ceil(gt_boxes2d[b, cam, cnt, 3] / 8))
                for vv in range(max(v8a, 0), min(v8b, h8)):
                    for uu in range(max(u8a, 0), min(u8b, w8)):
                        depth_bins[b, cam, vv * w8 + uu] = idx
                        depth_fg[b, cam, vv * w8 + uu] = True
                cnt += 1

    data = dict(
        images=images,
        lidar2img=np.tile(lidar2img[None], (batch, 1, 1, 1)),
        intrinsics=np.tile(intr[None], (batch, 1, 1, 1)),
        extrinsics=np.tile(extr[None], (batch, 1, 1, 1)),
        timestamp=np.zeros((batch,), np.float32),
        prev_exists=np.zeros((batch,), np.float32),
        ego_pose=np.tile(np.eye(4, dtype=np.float32)[None], (batch, 1, 1)),
        ego_pose_inv=np.tile(np.eye(4, dtype=np.float32)[None], (batch, 1, 1)),
        gt_boxes=gt_boxes,
        gt_velocity=(rng.uniform(-2, 2, (batch, g, 2)) * gt_mask[..., None]
                     ).astype(np.float32),
        gt_labels=gt_labels, gt_mask=gt_mask,
        gt_boxes2d=gt_boxes2d, gt_labels2d=gt_labels2d,
        gt_centers2d=gt_centers2d, gt_mask2d=gt_mask2d,
        gt_depth_bins=depth_bins, gt_depth_fg=depth_fg,
    )
    if as_dict:
        return data
    return TrainBatch(**{k: np.asarray(v) for k, v in data.items()})
