#!/usr/bin/env python
"""StreamPETR nuScenes training CLI (second model family; the reference
repo registers the PETR stack but ships no nuScenes training config —
StreamPETR training otherwise lives in the upstream StreamPETR repo).

python tools/train_nusc.py --data-root data/nuscenes \
    [--ann-file nuscenes2d_temporal_infos_train.pkl] \
    [--work-dir work_dirs/streampetr] [--max-iters N]
"""

import argparse
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-root', required=True)
    p.add_argument('--ann-file', default=None)
    p.add_argument('--work-dir', default='work_dirs/streampetr')
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--max-iters', type=int, default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--src-wh', type=int, nargs=2, default=(1600, 900))
    p.add_argument('--log-interval', type=int, default=50)
    p.add_argument('--ckpt-interval', type=int, default=2000)
    p.add_argument('--set', dest='overrides', action='append', default=[],
                   metavar='KEY=VAL',
                   help='dotted StreamPETRConfig overrides, e.g. '
                        '--set num_layers=2')
    args = p.parse_args()

    import dataclasses

    import jax
    import numpy as np
    from far3d_tpu.config import TrainConfig
    from far3d_tpu.data.loader import TrainLoader
    from far3d_tpu.data.nuscenes_dataset import NuScenesSequenceDataset
    from far3d_tpu.eval.petr_runner import petr_host_config
    from far3d_tpu.models.streampetr import StreamPETRConfig
    from far3d_tpu.parallel.mesh import (init_distributed, make_mesh,
                                         shard_batch)
    from far3d_tpu.train.petr_step import (create_petr_train_state,
                                           make_petr_train_step)

    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(levelname)s %(message)s')
    log = logging.getLogger('train_nusc')
    init_distributed()
    rank, world = jax.process_index(), jax.process_count()
    batch = args.batch_size or jax.local_device_count()

    from far3d_tpu.config import apply_overrides
    cfg = apply_overrides(StreamPETRConfig(), args.overrides)
    tcfg = dataclasses.replace(TrainConfig(), seed=args.seed)
    if args.max_iters:
        tcfg = dataclasses.replace(tcfg, total_iters=args.max_iters)

    ann = args.ann_file or \
        f'{args.data_root}/nuscenes2d_temporal_infos_train.pkl'
    dataset = NuScenesSequenceDataset(ann, args.data_root, seq_split_num=2)
    host_cfg = petr_host_config(cfg, tuple(args.src_wh))
    loader = TrainLoader(dataset, host_cfg, batch_size=batch, rank=rank,
                         world_size=world, seed=args.seed)

    state, tstate = create_petr_train_state(
        cfg, jax.random.PRNGKey(args.seed), batch=batch, train_cfg=tcfg)
    mesh = make_mesh()
    step = jax.jit(make_petr_train_step(cfg, tcfg), donate_argnums=(1,))

    work = Path(args.work_dir)
    work.mkdir(parents=True, exist_ok=True)
    total = args.max_iters or tcfg.total_iters
    t0 = time.time()
    with jax.set_mesh(mesh):
        tstate = shard_batch(mesh, tstate)
        for it, batch_data in enumerate(loader):
            if it >= total:
                break
            batch_data = shard_batch(mesh, batch_data)
            state, tstate, metrics = step(state, tstate, batch_data,
                                          jax.random.PRNGKey(args.seed + 1))
            if rank == 0 and (it % args.log_interval == 0 or it + 1 == total):
                loss = float(np.asarray(metrics['total_loss']))
                gn = float(np.asarray(metrics['grad_norm']))
                log.info('iter %d/%d loss %.4f grad %.2f (%.2f it/s)',
                         it, total, loss, gn,
                         (it + 1) / max(time.time() - t0, 1e-6))
            if rank == 0 and it > 0 and (it % args.ckpt_interval == 0
                                         or it + 1 == total):
                from far3d_tpu.utils.checkpoint import CheckpointManager
                mgr = CheckpointManager(str(work / 'variables'))
                mgr.save(it, {'params': jax.device_get(state.params),
                              'stats': jax.device_get(state.stats)})
                mgr.close()
                log.info('saved %s at iter %d', work / 'variables', it)
    loader.stop()


if __name__ == '__main__':
    main()
