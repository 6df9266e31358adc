"""Multi-host launch path: 2 real OS processes join one jax.distributed
coordination service on CPU and run a cross-process collective through the
same mesh helpers training uses (reference analogue: torch.distributed.launch
two-node path, tools/multi_dist_train.sh:5-38).

This is the process-count test the single-process 8-device mesh tests cannot
provide: it exercises jax.distributed.initialize, global device discovery,
and a jit-inserted psum spanning processes."""

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
sys.path.insert(0, sys.argv[4])
import jax
jax.config.update('jax_platforms', 'cpu')
from far3d_tpu.parallel.mesh import DATA_AXIS, init_distributed, make_mesh

os.environ['FAR3D_COORDINATOR'] = sys.argv[1]
os.environ['FAR3D_NUM_PROCESSES'] = sys.argv[2]
os.environ['FAR3D_PROCESS_ID'] = sys.argv[3]
pid, nprocs = init_distributed()
assert nprocs == 2, nprocs
assert len(jax.devices()) == 4, jax.devices()

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = make_mesh()
# each process contributes its local half of a global batch of 4
local = np.full((2, 3), float(pid + 1), np.float32)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(DATA_AXIS)), local, global_shape=(4, 3))

@jax.jit
def global_sum(x):
    return x.sum()

out = float(global_sum(garr))          # (1+1+2+2) * 3 = 18
assert abs(out - 18.0) < 1e-6, out
print(f'proc{pid} ok {out}', flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_collective(tmp_path):
    coord = f'127.0.0.1:{_free_port()}'
    # strip the TPU runtime's env so sitecustomize does not register (and
    # initialize) the axon PJRT backend before jax.distributed comes up
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('PALLAS_AXON', 'AXON', 'TPU_'))
           and k not in ('JAX_PLATFORMS',)}
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    procs = [
        subprocess.Popen(
            [sys.executable, '-c', WORKER, coord, '2', str(pid), str(REPO)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'proc{pid} failed:\n{out}'
        assert f'proc{pid} ok 18.0' in out, out
