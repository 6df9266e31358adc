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
    env plumbing: reference tools/multi_dist_train.sh:5-38, slurm_train.sh,
    tools/train.py:74-78). Returns (process_index, process_count).

    Three launch paths, in priority order:
      1. Explicit env (set by tools/dist_train.sh):
         FAR3D_COORDINATOR=host:port  FAR3D_NUM_PROCESSES  FAR3D_PROCESS_ID
      2. Cluster auto-detection (Cloud TPU pods, Slurm, OpenMPI): any host
         environment jax.distributed recognizes — triggered when
         SLURM_NTASKS>1 or JAX_COORDINATOR_ADDRESS is set.
      3. Single host: no-op.
    """
    import os
    env = os.environ
    if 'FAR3D_COORDINATOR' in env:
        jax.distributed.initialize(
            coordinator_address=env['FAR3D_COORDINATOR'],
            num_processes=int(env['FAR3D_NUM_PROCESSES']),
            process_id=int(env['FAR3D_PROCESS_ID']))
    elif ('JAX_COORDINATOR_ADDRESS' in env
          or int(env.get('SLURM_NTASKS', '1')) > 1):
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()
