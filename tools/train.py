#!/usr/bin/env python
"""Training CLI (reference: tools/train.py + dist_train.sh).

Single-host: python tools/train.py --data-root data/av2 --work-dir work_dirs/far3d
Multi-host:  set JAX_COORDINATOR_ADDRESS etc. and launch one process per host;
             the data mesh spans all hosts (no torch.distributed.launch).
"""

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-root', required=True)
    p.add_argument('--ann-file', default=None)
    p.add_argument('--work-dir', default='work_dirs/far3d')
    p.add_argument('--batch-size', type=int, default=None,
                   help='per-host batch (default: local device count)')
    p.add_argument('--max-iters', type=int, default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--no-resume', action='store_true')
    p.add_argument('--load-from', default=None,
                   help='torch checkpoint to convert & load (e.g. the FCOS3D '
                        'VoVNet backbone pretrain, far3d.py:284)')
    p.add_argument('--profile-at', type=int, default=None)
    args = p.parse_args()

    import jax
    from far3d_tpu.config import Far3DConfig
    from far3d_tpu.data.av2_dataset import AV2SequenceDataset
    from far3d_tpu.data.loader import TrainLoader
    from far3d_tpu.parallel.mesh import init_distributed
    from far3d_tpu.train.runner import run_training

    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(levelname)s %(message)s')
    init_distributed()
    import dataclasses
    cfg = Far3DConfig()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, seed=args.seed))

    rank = jax.process_index()
    world = jax.process_count()
    batch = args.batch_size or jax.local_device_count()
    ann = args.ann_file or f'{args.data_root}/av2_train_infos.pkl'
    dataset = AV2SequenceDataset(ann, args.data_root, split='train',
                                 seq_split_num=cfg.data.seq_split_num)
    loader = TrainLoader(dataset, cfg, batch, rank=rank, world_size=world,
                         seed=args.seed)
    Path(args.work_dir).mkdir(parents=True, exist_ok=True)

    run_training(cfg, loader, args.work_dir, batch,
                 resume=not args.no_resume, max_iters=args.max_iters,
                 profile_at=args.profile_at, load_from=args.load_from)


if __name__ == '__main__':
    main()
