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


EVAL_WORKER = r"""
import sys
sys.path.insert(0, sys.argv[1])
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from far3d_tpu.config import tiny_test_config
from far3d_tpu.data.av2_dataset import AV2SequenceDataset
from far3d_tpu.data.loader import EvalLoader
from far3d_tpu.eval.runner import collect_and_evaluate, run_inference
from far3d_tpu.train.step import create_train_state

ann, root, results_dir, rank = (sys.argv[2], sys.argv[3], sys.argv[4],
                                int(sys.argv[5]))
cfg = tiny_test_config()
dataset = AV2SequenceDataset(ann, root, split='val', seq_split_num=1,
                             test_mode=False)
state, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
variables = {'params': state.params, 'stats': state.stats,
             'batch_stats': state.batch_stats}
loader = EvalLoader(dataset, cfg, rank=rank, world_size=2, num_threads=2)
results = run_inference(cfg, variables, loader)
print('rank%d indices %s' % (rank, ','.join(str(r['index'])
                                            for r in results)), flush=True)
out = collect_and_evaluate(cfg, dataset, results_dir, rank, 2, results)
if rank == 0:
    summary, means = out
    print('rank0 ngts %d' % sum(r['num_gts'] for r in summary.values()),
          flush=True)
    assert 0.0 <= means['mAP'] <= 1.0, means
print('rank%d done' % rank, flush=True)
"""


def test_two_process_eval_collection(tmp_path):
    """The reference's collect_results_cpu semantics (core/apis/test.py:
    116-160) over 2 REAL processes: each rank streams its contiguous
    EvalShardSampler shard through the jitted infer step and writes a
    part file; rank 0 waits on the shared FS, concatenates IN RANK ORDER,
    and evaluates. Asserts the concatenated frame order/count equals the
    single-process order (0..n-1: EvalShardSampler with world_size=1 is the
    identity), the padded tail repeat is dropped, and rank 0's metric pass
    consumed BOTH shards' ground truth."""
    import pickle

    import cv2
    import numpy as np
    from test_data import make_fake_infos

    from far3d_tpu.data.av2_dataset import AV2SequenceDataset

    root = tmp_path / 'av2'
    root.mkdir()
    ann = root / 'infos.pkl'
    # 9 frames over 2 ranks -> per-rank 5, rank 1 carries one padded repeat
    make_fake_infos(ann, n_scenes=3, frames_per_scene=3, n_cams=2)
    with open(ann, 'rb') as f:
        infos = pickle.load(f)['infos']
    rng = np.random.RandomState(0)
    for info in infos:
        for cam in info['cam_infos'].values():
            path = root / cam['fpath']
            path.parent.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(path), (rng.rand(128, 192, 3) * 255
                                    ).astype(np.uint8))
    results_dir = str(tmp_path / 'results')

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('PALLAS_AXON', 'AXON', 'TPU_'))
           and k not in ('JAX_PLATFORMS',)}
    env['JAX_PLATFORMS'] = 'cpu'
    procs = [
        subprocess.Popen(
            [sys.executable, '-c', EVAL_WORKER, str(REPO), str(ann),
             str(root), results_dir, str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True, cwd=str(REPO / 'tests'))
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'rank{rank} failed:\n{out}'
        assert f'rank{rank} done' in out, out

    # per-rank shard contents: contiguous, ordered, pad dropped
    assert 'rank0 indices 0,1,2,3,4' in outs[0], outs[0]
    assert 'rank1 indices 5,6,7,8' in outs[1], outs[1]

    # rank-order concatenation reproduces the single-process order 0..8
    parts = []
    for rank in range(2):
        with open(f'{results_dir}/part_{rank}.pkl', 'rb') as f:
            parts.extend(pickle.load(f))
    assert [r['index'] for r in parts] == list(range(9))

    # rank 0 evaluated the union of both shards' GT
    dataset = AV2SequenceDataset(str(ann), str(root), split='val',
                                 seq_split_num=1, test_mode=False)
    want_gts = sum(len(dataset.get_frame(i)['gt_boxes_3d'])
                   for i in range(9))
    assert f'rank0 ngts {want_gts}' in outs[0], outs[0]
