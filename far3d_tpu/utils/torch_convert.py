"""Convert reference PyTorch checkpoints (iter_82548.pth, the FCOS3D VoVNet
backbone pretrain) into this framework's flax variable tree.

The reference's module names are mapped explicitly (see tools/filter_ckpt.py
for how the reference remaps pretrains). Weight-shared branches: the reference
repeats the same cls/reg branch instance across its 6 decoder layers
(farhead.py:248-251), so `cls_branches.0.*` feeds our single shared branch.

Layout transforms: torch conv (O,I,kh,kw) -> flax (kh,kw,I,O); linear (O,I) ->
(I,O); torch nn.MultiheadAttention packed in_proj -> flax per-head q/k/v.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):
    return np.transpose(w, (1, 0))


def _build_mapping(cfg) -> List[Tuple[Tuple[str, ...], str, str]]:
    """[(our_path (collection, *keys), ref_key, kind)]"""
    m: List[Tuple[Tuple[str, ...], str, str]] = []

    def conv_bn(our_prefix: Tuple[str, ...], ref_prefix: str,
                stats_col: str = 'stats'):
        m.append((('params',) + our_prefix + ('conv', 'kernel'),
                  ref_prefix + '/conv.weight', 'conv'))
        m.append((('params',) + our_prefix + ('bn', 'scale'),
                  ref_prefix + '/norm.weight', 'copy'))
        m.append((('params',) + our_prefix + ('bn', 'bias'),
                  ref_prefix + '/norm.bias', 'copy'))
        m.append(((stats_col,) + our_prefix + ('bn', 'mean'),
                  ref_prefix + '/norm.running_mean', 'copy'))
        m.append(((stats_col,) + our_prefix + ('bn', 'var'),
                  ref_prefix + '/norm.running_var', 'copy'))

    def linear(our_prefix: Tuple[str, ...], ref_prefix: str):
        m.append((('params',) + our_prefix + ('kernel',),
                  ref_prefix + '.weight', 'lin'))
        m.append((('params',) + our_prefix + ('bias',),
                  ref_prefix + '.bias', 'copy'))

    def conv2d(our_prefix: Tuple[str, ...], ref_prefix: str, bias=True):
        m.append((('params',) + our_prefix + ('kernel',),
                  ref_prefix + '.weight', 'conv'))
        if bias:
            m.append((('params',) + our_prefix + ('bias',),
                      ref_prefix + '.bias', 'copy'))

    def layernorm(our_prefix: Tuple[str, ...], ref_prefix: str):
        m.append((('params',) + our_prefix + ('scale',),
                  ref_prefix + '.weight', 'copy'))
        m.append((('params',) + our_prefix + ('bias',),
                  ref_prefix + '.bias', 'copy'))

    # ---- backbone (vovnet.py naming) ----------------------------------
    for k in (1, 2, 3):
        conv_bn(('backbone', f'stem{k}'), f'img_backbone.stem.stem_{k}')
    for si, nblocks in enumerate(cfg.backbone.blocks_per_stage):
        s = si + 2
        for b in range(nblocks):
            ours = ('backbone', f'stage{s}_block{b}')
            ref = f'img_backbone.stage{s}.OSA{s}_{b + 1}'
            for i in range(cfg.backbone.layers_per_block):
                conv_bn(ours + (f'layer{i}',),
                        f'{ref}.layers.{i}.OSA{s}_{b + 1}_{i}')
            conv_bn(ours + ('concat',), f'{ref}.concat.OSA{s}_{b + 1}_concat')
            conv2d(ours + ('ese', 'fc'), f'{ref}.ese.fc')

    # ---- neck (mmdet FPN naming) ---------------------------------------
    n_used = len(cfg.neck.in_channels) - cfg.neck.start_level
    for i in range(n_used):
        conv2d(('neck', f'lateral{i}'), f'img_neck.lateral_convs.{i}.conv')
    for i in range(cfg.neck.num_outs):
        conv2d(('neck', f'fpn{i}'), f'img_neck.fpn_convs.{i}.conv')

    # ---- 2D roi head ----------------------------------------------------
    for l in range(len(cfg.roi2d.strides)):
        for s in range(cfg.roi2d.stacked_convs):
            for tower, ref_t in (('cls_tower', 'multi_level_cls_convs'),
                                 ('reg_tower', 'multi_level_reg_convs')):
                base = ('roi_head', f'{tower}{l}_{s}')
                ref = f'img_roi_head.{ref_t}.{l}.{s}'
                m.append((('params',) + base + ('conv', 'kernel'),
                          ref + '.conv.weight', 'conv'))
                m.append((('params',) + base + ('bn', 'scale'),
                          ref + '.bn.weight', 'copy'))
                m.append((('params',) + base + ('bn', 'bias'),
                          ref + '.bn.bias', 'copy'))
                m.append((('batch_stats',) + base + ('bn', 'mean'),
                          ref + '.bn.running_mean', 'copy'))
                m.append((('batch_stats',) + base + ('bn', 'var'),
                          ref + '.bn.running_var', 'copy'))
        for ours, ref in (('conv_cls', 'multi_level_conv_cls'),
                          ('conv_reg', 'multi_level_conv_reg'),
                          ('conv_obj', 'multi_level_conv_obj'),
                          ('conv_centers2d', 'multi_level_conv_centers2d')):
            conv2d(('roi_head', f'{ours}{l}'), f'img_roi_head.{ref}.{l}')
    for i in range(cfg.depthnet.conv_layers):
        conv2d(('roi_head', 'depthnet', f'conv{i}', 'conv'),
               f'img_roi_head.depthnet.depth_head.{i}.0')
        m.append((('params', 'roi_head', 'depthnet', f'conv{i}', 'gn', 'scale'),
                  f'img_roi_head.depthnet.depth_head.{i}.1.weight', 'copy'))
        m.append((('params', 'roi_head', 'depthnet', f'conv{i}', 'gn', 'bias'),
                  f'img_roi_head.depthnet.depth_head.{i}.1.bias', 'copy'))
    conv2d(('roi_head', 'depthnet', 'classifier'),
           'img_roi_head.depthnet.depth_classifier')

    # ---- FarHead ---------------------------------------------------------
    P = 'pts_bbox_head'
    m.append((('params', 'pts_head', 'reference_points'),
              f'{P}.reference_points.weight', 'copy'))
    m.append((('params', 'pts_head', 'pseudo_reference_points'),
              f'{P}.pseudo_reference_points.weight', 'copy'))
    for mln, ref in (('spatial_alignment', 'spatial_alignment'),
                     ('ego_pose_pe', 'ego_pose_pe'),
                     ('ego_pose_memory', 'ego_pose_memory')):
        linear(('pts_head', mln, 'reduce'), f'{P}.{ref}.reduce.0')
        linear(('pts_head', mln, 'gamma'), f'{P}.{ref}.gamma')
        linear(('pts_head', mln, 'beta'), f'{P}.{ref}.beta')
    linear(('pts_head', 'query_embedding', 'dense0'), f'{P}.query_embedding.0')
    linear(('pts_head', 'query_embedding', 'dense1'), f'{P}.query_embedding.2')
    linear(('pts_head', 'context_embed', 'dense0'), f'{P}.context_embed.0')
    linear(('pts_head', 'context_embed', 'dense1'), f'{P}.context_embed.2')
    linear(('pts_head', 'time_fc'), f'{P}.time_embedding.0')
    layernorm(('pts_head', 'time_ln'), f'{P}.time_embedding.1')
    # weight-shared cls/reg branches: use instance 0 (farhead.py:248-251)
    linear(('pts_head', 'cls_fc0'), f'{P}.cls_branches.0.0')
    layernorm(('pts_head', 'cls_ln0'), f'{P}.cls_branches.0.1')
    linear(('pts_head', 'cls_fc1'), f'{P}.cls_branches.0.3')
    layernorm(('pts_head', 'cls_ln1'), f'{P}.cls_branches.0.4')
    linear(('pts_head', 'cls_out'), f'{P}.cls_branches.0.6')
    linear(('pts_head', 'reg_fc0'), f'{P}.reg_branches.0.0')
    linear(('pts_head', 'reg_fc1'), f'{P}.reg_branches.0.2')
    linear(('pts_head', 'reg_out'), f'{P}.reg_branches.0.4')

    # ---- decoder layers --------------------------------------------------
    heads = cfg.decoder.num_heads
    for i in range(cfg.decoder.num_layers):
        L = ('pts_head', 'decoder', f'layer{i}')
        R = f'{P}.transformer.decoder.layers.{i}'
        for part, off in (('query', 0), ('key', 1), ('value', 2)):
            m.append((('params',) + L + ('self_attn', 'mha', part, 'kernel'),
                      f'{R}.attentions.0.attn.in_proj_weight',
                      f'mha_qkv_w{off}_{heads}'))
            m.append((('params',) + L + ('self_attn', 'mha', part, 'bias'),
                      f'{R}.attentions.0.attn.in_proj_bias',
                      f'mha_qkv_b{off}_{heads}'))
        m.append((('params',) + L + ('self_attn', 'mha', 'out', 'kernel'),
                  f'{R}.attentions.0.attn.out_proj.weight',
                  f'mha_out_w_{heads}'))
        m.append((('params',) + L + ('self_attn', 'mha', 'out', 'bias'),
                  f'{R}.attentions.0.attn.out_proj.bias', 'copy'))
        for ni in range(3):
            layernorm(L + (f'norm{ni}',), f'{R}.norms.{ni}')
        D = f'{R}.attentions.1'
        linear(L + ('cross_attn', 'weights_fc'), f'{D}.weights_fc')
        linear(L + ('cross_attn', 'output_proj'), f'{D}.output_proj')
        linear(L + ('cross_attn', 'learnable_fc'), f'{D}.learnable_fc')
        linear(L + ('cross_attn', 'cam_embed0'), f'{D}.cam_embed.0')
        linear(L + ('cross_attn', 'cam_embed1'), f'{D}.cam_embed.2')
        layernorm(L + ('cross_attn', 'cam_embed_ln'), f'{D}.cam_embed.4')
        linear(L + ('ffn', 'fc1'), f'{R}.ffns.0.layers.0.0')
        linear(L + ('ffn', 'fc2'), f'{R}.ffns.0.layers.1')
    return m


def _transform(value: np.ndarray, kind: str) -> np.ndarray:
    if kind == 'copy':
        return value
    if kind == 'conv':
        return _conv(value)
    if kind == 'lin':
        return _lin(value)
    if kind.startswith('mha_qkv_w'):
        off, heads = kind[len('mha_qkv_w'):].split('_')
        off, heads = int(off), int(heads)
        c = value.shape[1]
        w = value[off * c:(off + 1) * c]          # (C, C) torch (out, in)
        return _lin(w).reshape(c, heads, c // heads)
    if kind.startswith('mha_qkv_b'):
        off, heads = kind[len('mha_qkv_b'):].split('_')
        off, heads = int(off), int(heads)
        c = value.shape[0] // 3
        return value[off * c:(off + 1) * c].reshape(heads, c // heads)
    if kind.startswith('mha_out_w'):
        heads = int(kind.split('_')[-1])
        c = value.shape[0]
        return _lin(value).reshape(heads, c // heads, c)
    raise ValueError(kind)


def convert_state_dict(state_dict: Dict[str, np.ndarray], cfg,
                       variables: Dict[str, Any],
                       strict: bool = False) -> Dict[str, Any]:
    """Map a reference torch state_dict onto `variables` (our init tree).

    Missing reference keys keep our initialization (e.g. backbone-only
    pretrain); unexpected-shape entries raise."""
    import jax

    mapping = _build_mapping(cfg)
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    missing = []
    for path, ref_key, kind in mapping:
        if ref_key not in state_dict:
            missing.append(ref_key)
            continue
        flat[path] = _transform(np.asarray(state_dict[ref_key]), kind)
    if strict and missing:
        raise KeyError(f'missing reference keys: {missing[:10]}...')

    def set_path(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k]
        old = node[path[-1]]
        if tuple(old.shape) != tuple(value.shape):
            raise ValueError(
                f'shape mismatch at {path}: ours {old.shape} vs ckpt '
                f'{value.shape}')
        node[path[-1]] = value.astype(np.asarray(old).dtype)

    import copy as _copy
    out = jax.tree_util.tree_map(np.asarray, variables)
    out = _copy.deepcopy(out)
    for path, value in flat.items():
        set_path(out, path, value)
    return out, missing


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt)
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, 'numpy')}


def reference_key_shapes(cfg, variables) -> Dict[str, Tuple[int, ...]]:
    """Expected reference-checkpoint keys and their torch-side shapes
    (inverse of the transforms) — used for synthetic round-trip tests."""
    import jax
    shapes = {}
    flatvars = {}
    for col in variables:
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                variables[col])[0]:
            keys = (col,) + tuple(getattr(p, 'key', str(p)) for p in path)
            flatvars[keys] = np.asarray(leaf).shape
    for path, ref_key, kind in _build_mapping(cfg):
        if path not in flatvars:
            continue
        s = flatvars[path]
        if kind == 'copy':
            shapes[ref_key] = s
        elif kind == 'conv':
            shapes[ref_key] = (s[3], s[2], s[0], s[1])
        elif kind == 'lin':
            shapes[ref_key] = (s[1], s[0])
        elif kind.startswith('mha_qkv_w'):
            c = s[0]
            shapes[ref_key] = (3 * c, c)
        elif kind.startswith('mha_qkv_b'):
            c = s[0] * s[1]
            shapes[ref_key] = (3 * c,)
        elif kind.startswith('mha_out_w'):
            c = s[2]
            shapes[ref_key] = (c, c)
    return shapes
