"""Camera-sharded streaming inference: latency scaling across chips.

The reference has exactly one parallelism strategy — data parallelism
(SURVEY.md §2.5) — which helps training throughput but does nothing for
single-stream inference latency. On a TPU slice the natural extra axis is
the *camera* dimension: the backbone/FPN/2D-head (46.7 of 82.7 ms/frame on
one v5e, docs/PROFILE.md) is embarrassingly parallel over the 7 ring
cameras, so a `cam` mesh axis shards it nearly linearly while XLA's GSPMD
inserts the cross-camera collectives where the model genuinely couples
cameras (the joint proposal top-K, the deformable attention's softmax over
cams x levels x points, and the camera-sum after sampling).

This is deliberately GSPMD-driven rather than shard_map-rewritten: the
model's cross-camera ops stay written as plain jnp, the sharding annotations
live only at the jit boundary, and correctness is independent of how the
partitioner splits (tests pin sharded == unsharded numerics on a CPU mesh).
The decoder's query-space ops replicate — they are small — so the expected
frame latency on N chips is ~(backbone / N + decoder), not frame / N; this
is a latency mode, not a throughput mode (for throughput, one stream per
chip already saturates a v5e — docs/PROFILE.md).

The Pallas MSDA op carries a `custom_partitioning` rule over its leading
B*N axis (ops/msda_pallas.py:_partitioned_forward), so camera sharding
composes with `deform.use_pallas=True`: each device runs the kernel on its
local camera slice instead of GSPMD gathering operands around an opaque
custom call (pinned by tests/test_msda.py::
test_msda_pallas_custom_partitioning_cpu_mesh).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CAM_AXIS = 'cam'

# per-camera batch keys of the infer-step input dict: (B, N_cams, ...)
_CAM_KEYS = ('images', 'lidar2img', 'intrinsics', 'extrinsics')


def make_cam_mesh(n_cams: int, devices: Optional[Any] = None) -> Mesh:
    """1-D `cam` mesh over the first `n_cams` devices (7 for AV2)."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_cams:
        raise ValueError(
            f'camera sharding needs >= {n_cams} devices, have {len(devices)}')
    return Mesh(np.asarray(devices[:n_cams]), (CAM_AXIS,))


def cam_shardings(mesh: Mesh, kwargs: dict) -> dict:
    """PartitionSpec tree for the infer-step input dict: camera-batch
    tensors shard axis 1 over `cam`, everything else replicates."""
    return {k: NamedSharding(mesh, P(None, CAM_AXIS) if k in _CAM_KEYS
                             else P())
            for k in kwargs}


def make_cam_sharded_infer(model, cfg, mesh: Mesh):
    """jit'd (variables, tstate, kwargs) -> (detections, new_state) with the
    camera axis sharded over `mesh` and replicated outputs.

    `kwargs` must be the usual infer-step dict (images, lidar2img,
    intrinsics, extrinsics, prev_exists, timestamp, ego_pose, ego_pose_inv).
    """
    from ..models.detector import decode_detections

    rep = NamedSharding(mesh, P())

    def step(variables, tstate, kw):
        out = model.apply(variables, state=tstate, **kw)
        dets = decode_detections(out['all_cls_scores'][-1],
                                 out['all_bbox_preds'][-1],
                                 out['query_valid'], cfg)
        return dets, out['state']

    jitted = {}    # kwargs key-set -> compiled step (one retrace per schema)

    def run(variables, tstate, kwargs):
        keys = tuple(sorted(kwargs))
        if keys not in jitted:
            shardings = cam_shardings(mesh, kwargs)
            jitted[keys] = (jax.jit(step,
                                    in_shardings=(rep, rep, shardings),
                                    out_shardings=rep), shardings)
        f, shardings = jitted[keys]
        kw = {k: jax.device_put(v, shardings[k]) for k, v in kwargs.items()}
        return f(variables, tstate, kw)

    return run
