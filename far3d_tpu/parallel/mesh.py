"""Device mesh + shardings (TPU-native replacement of the reference's
NCCL/DDP stack, SURVEY.md §2.5).

The reference's only parallelism is synchronous data parallelism via torch DDP
(core/apis/mmdet_train.py:79-83). The TPU-native equivalent: one `data` mesh
axis; the batch (and the per-batch-lane temporal state) is sharded over it,
parameters are replicated, and XLA inserts the gradient all-reduce — no
explicit collectives. The temporal recurrence stays valid because the
streaming sampler (data/sampler.py) pins one scene stream per batch lane, and
lanes never move between devices.

For multi-host (the reference's multi-node NCCL path, multi_dist_train.sh),
`jax.distributed.initialize` extends the same mesh across hosts over ICI/DCN.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(devices: Optional[Any] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Device_put every leaf with its leading dim sharded over `data`."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def init_distributed():
    """Multi-host initialization (replaces torch.distributed.launch / Slurm
    env plumbing, tools/train.py:74-78). No-op on a single host."""
    import os
    if 'JAX_COORDINATOR_ADDRESS' in os.environ:
        jax.distributed.initialize()
