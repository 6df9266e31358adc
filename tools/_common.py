"""Shared CLI plumbing for the tools: checkpoint loading and dataset args."""

from __future__ import annotations


def honor_jax_platforms():
    """This image's sitecustomize force-registers the axon TPU backend, so
    the JAX_PLATFORMS env var alone does not re-point jax (CLAUDE.md).
    Honor it explicitly — must run BEFORE any backend use."""
    import os
    plat = os.environ.get('JAX_PLATFORMS')
    if plat:
        import jax
        jax.config.update('jax_platforms', plat)


def add_common_args(p):
    p.add_argument('--data-root', required=True)
    p.add_argument('--ann-file', default=None)
    p.add_argument('--dataset', choices=('av2', 'nuscenes'), default='av2',
                   help='dataset family (reference: Argoverse2DatasetT / '
                        'CustomNuScenesDataset)')
    p.add_argument('--checkpoint', default=None,
                   help='orbax work dir written by tools/train.py')
    p.add_argument('--torch-checkpoint', default=None,
                   help='reference .pth to convert on the fly')
    p.add_argument('--out-dir', default='vis')
    p.add_argument('--num-frames', type=int, default=10)
    return p


def load_variables(cfg, args):
    """Model variables from --checkpoint / --torch-checkpoint, or random
    init when neither is given (pipeline-debug tools work untrained)."""
    import jax
    from far3d_tpu.train.step import create_train_state

    state, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    if args.torch_checkpoint:
        from far3d_tpu.utils.torch_convert import (convert_state_dict,
                                                   load_torch_checkpoint)
        out, _ = convert_state_dict(
            load_torch_checkpoint(args.torch_checkpoint), cfg,
            {'params': state.params, 'stats': state.stats,
             'batch_stats': state.batch_stats})
        return out
    if args.checkpoint:
        from far3d_tpu.utils.checkpoint import CheckpointManager
        state = CheckpointManager(args.checkpoint).restore(state)
    return {'params': state.params, 'stats': state.stats,
            'batch_stats': state.batch_stats}


def build_dataset(cfg, args, split='val'):
    if getattr(args, 'dataset', 'av2') == 'nuscenes':
        from far3d_tpu.data.nuscenes_dataset import NuScenesSequenceDataset
        ann = args.ann_file or \
            f'{args.data_root}/nuscenes2d_temporal_infos_{split}.pkl'
        return NuScenesSequenceDataset(ann, args.data_root, seq_split_num=1)
    from far3d_tpu.data.av2_dataset import AV2SequenceDataset
    ann = args.ann_file or f'{args.data_root}/av2_{split}_infos.pkl'
    return AV2SequenceDataset(ann, args.data_root, split=split,
                              test_mode=False, seq_split_num=1)
