"""Composed full-model torch parity.

The leaf tests (test_torch_parity.py) prove individual modules; these prove
the *composition* against a functional-torch reimplementation of the
reference forward (tests/_torch_ref.py), with all weights routed through
`convert_state_dict` — so every silent convention (softmax axis grouping,
sin/cos interleave, DN mask layout, sigmoid refinement, proposal lifting,
memory update) is checked end to end. If any composition seam diverges from
the reference semantics, converted-checkpoint inference would be wrong and
one of these tests fails.

Ordering note: the reference keeps proposals in dynamic flattened order and
appends multi-depth extras slot-major (farhead.py:762-766); our static top-K
layout interleaves depth slots per proposal. Queries are permutation-
equivariant through the decoder, so the tests compare through an explicit
(cam, flat_idx, depth_slot) key match.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import _torch_ref as tref
from far3d_tpu.config import MultiDepthConfig, tiny_test_config
from far3d_tpu.models.detector import Far3D, level_shapes
from far3d_tpu.models.farhead import FarHead, init_state
from far3d_tpu.models.heads2d import YoloxHead2D, select_proposals
from far3d_tpu.utils.synthetic import ring_cameras
from far3d_tpu.utils.torch_convert import convert_state_dict, reference_key_shapes

TOL = dict(rtol=1e-3, atol=2e-3)


def make_cfg():
    cfg = tiny_test_config()
    # enough static proposal slots to hold every threshold-passing proposal,
    # and the multi-depth topk=2 path (extras gated by range_min)
    cfg = dataclasses.replace(
        cfg,
        roi2d=dataclasses.replace(cfg.roi2d, num_proposals_2d=64),
        head=dataclasses.replace(
            cfg.head, multi_depth=MultiDepthConfig(topk=2, range_min=30.0)))
    return cfg


def make_sd(shapes, seed=0):
    """Random reference-keyed state dict, fan-in scaled for stable depth."""
    rng = np.random.default_rng(seed)
    sd = {}
    for k, s in shapes.items():
        if 'running_var' in k:
            v = rng.uniform(0.5, 1.5, s)
        elif 'running_mean' in k:
            v = rng.standard_normal(s) * 0.1
        elif 'reference_points' in k:
            v = rng.uniform(0.0, 1.0, s)
        elif k.endswith('.weight') and len(s) == 1:
            v = rng.uniform(0.75, 1.25, s)          # norm scales
        elif k.endswith('.weight'):
            fan_in = int(np.prod(s[1:]))
            v = rng.standard_normal(s) / np.sqrt(fan_in)
        else:
            v = rng.standard_normal(s) * 0.1        # biases
        sd[k] = v.astype(np.float32)
    # steer 2D scores so that a moderate number of proposals pass the 0.1
    # threshold (obj ~ sigmoid(-1), cls max ~ sigmoid(0))
    for k in list(sd):
        if 'conv_obj' in k and k.endswith('.bias'):
            sd[k] = (rng.standard_normal(sd[k].shape) * 0.5 - 1.0
                     ).astype(np.float32)
    return sd


@pytest.fixture(scope='module')
def setup():
    cfg = make_cfg()
    model = Far3D(cfg)
    b, n = 1, cfg.data.num_cams
    h, w = cfg.data.input_hw
    eye = jnp.tile(jnp.eye(4)[None, None], (b, n, 1, 1))
    tstate = init_state(b, cfg.head)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), images=jnp.zeros((b, n, h, w, 3)),
        lidar2img=eye, intrinsics=eye, extrinsics=eye, state=tstate,
        prev_exists=jnp.zeros((b,)), timestamp=jnp.zeros((b,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
        dn_ref_points=jnp.zeros((b, 24, 3)), dn_valid=jnp.ones((b, 24), bool))
    sd = make_sd(reference_key_shapes(cfg, variables))
    converted, _ = convert_state_dict(sd, cfg, variables)
    converted = jax.tree_util.tree_map(jnp.asarray, converted)
    return cfg, variables, sd, converted


def _feat_pyramid(cfg, seed=10):
    """Random NHWC FPN-level features at the tiny shapes."""
    rng = np.random.default_rng(seed)
    bn = cfg.data.num_cams
    shapes = level_shapes(cfg)
    return [rng.standard_normal((bn, h, w, cfg.neck.out_channels)
                                ).astype(np.float32) for h, w in shapes]


def _nchw(x):
    return torch.from_numpy(np.transpose(np.asarray(x), (0, 3, 1, 2)))


# ---------------------------------------------------------------- 2D head

def test_yolox_head_composed(setup):
    """Towers + predictors + depth net as one unit (yolox_head.py:241-341)."""
    cfg, _, sd, converted = setup
    feats = _feat_pyramid(cfg)
    head = YoloxHead2D(cfg.roi2d, cfg.depthnet)
    ours = head.apply({'params': converted['params']['roi_head'],
                       'batch_stats': converted['batch_stats']['roi_head']},
                      [jnp.asarray(f) for f in feats])
    ref = tref.yolox_forward([_nchw(f) for f in feats], sd, cfg)
    for lvl in range(len(feats)):
        for ok, rk in (('cls_scores', 'cls_scores'), ('bbox_preds', 'bbox_preds'),
                       ('objectnesses', 'objectnesses'),
                       ('centers2d_offsets', 'centers2d')):
            np.testing.assert_allclose(
                np.asarray(ours[ok][lvl]),
                ref[rk][lvl].permute(0, 2, 3, 1).numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(ours['depth_logit']),
                               ref['depth_logit'].permute(0, 2, 3, 1).numpy(),
                               **TOL)


def test_proposal_selection_matches_reference_set(setup):
    """Static top-K + validity mask == the reference's dynamic threshold set
    (yolox_head.py:424-467)."""
    cfg, _, sd, converted = setup
    feats = _feat_pyramid(cfg)
    head = YoloxHead2D(cfg.roi2d, cfg.depthnet)
    outs = head.apply({'params': converted['params']['roi_head'],
                       'batch_stats': converted['batch_stats']['roi_head']},
                      [jnp.asarray(f) for f in feats])
    mine = select_proposals(outs, 1, cfg.data.num_cams, cfg.roi2d.strides,
                            cfg.roi2d.num_proposals_2d,
                            cfg.roi2d.threshold_score)
    ref = tref.select_proposals_ref(
        tref.yolox_forward([_nchw(f) for f in feats], sd, cfg), cfg)

    ref_set = {}
    for cam, p in enumerate(ref):
        for i in range(len(p['flat_idx'])):
            ref_set[(cam, int(p['flat_idx'][i]))] = (
                p['boxes'][i].numpy(), float(p['scores'][i, 0]))
    n_ref = len(ref_set)
    assert 0 < n_ref < cfg.roi2d.num_proposals_2d, n_ref

    valid = np.asarray(mine['valid'][0])
    my_keys = set()
    for k in range(cfg.roi2d.num_proposals_2d):
        if not valid[k]:
            continue
        key = (int(mine['cam_idx'][0, k]), int(mine['flat_idx'][0, k]))
        my_keys.add(key)
        box_r, score_r = ref_set[key]
        np.testing.assert_allclose(np.asarray(mine['boxes'][0, k]), box_r,
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(float(mine['scores'][0, k, 0]), score_r,
                                   rtol=1e-4, atol=1e-5)
    assert my_keys == set(ref_set)


def test_build_query2d_composed(setup):
    """2D->3D lift: depth gather, multi-depth extras, log-odds context, ref
    point unprojection (farhead.py:710-827), through the slot permutation."""
    cfg, _, sd, converted = setup
    from far3d_tpu.models.farhead import build_query2d_proposals
    rng = np.random.default_rng(3)
    n = cfg.data.num_cams
    h, w = cfg.data.input_hw
    h8, w8 = h // cfg.depthnet.stride, w // cfg.depthnet.stride
    c = cfg.head.embed_dims
    lt = sum(hh * ww for hh, ww in level_shapes(cfg))

    feats = _feat_pyramid(cfg)
    head = YoloxHead2D(cfg.roi2d, cfg.depthnet)
    outs = head.apply({'params': converted['params']['roi_head'],
                       'batch_stats': converted['batch_stats']['roi_head']},
                      [jnp.asarray(f) for f in feats])
    mine_prop = select_proposals(outs, 1, n, cfg.roi2d.strides,
                                 cfg.roi2d.num_proposals_2d,
                                 cfg.roi2d.threshold_score)
    ref_prop = tref.select_proposals_ref(
        tref.yolox_forward([_nchw(f) for f in feats], sd, cfg), cfg)

    depth_logit = rng.standard_normal(
        (n, h8, w8, cfg.depthnet.num_depth_bins + 1)).astype(np.float32)
    depth_probs_t = torch.from_numpy(depth_logit).softmax(dim=-1)
    depth_probs = jnp.asarray(depth_probs_t.numpy()).reshape(1, n, h8 * w8, -1)
    feat_aligned = rng.standard_normal((n, lt, c)).astype(np.float32)
    intr, extr = ring_cameras(n, h, w)
    l2i = np.einsum('nij,njk->nik', intr, extr).astype(np.float32)

    ref, ctx, valid = build_query2d_proposals(
        {k: jnp.asarray(v) for k, v in mine_prop.items()},
        depth_probs, jnp.asarray(feat_aligned)[None], jnp.asarray(l2i)[None],
        (h, w), cfg.depthnet, cfg.head.multi_depth, cfg.pc_range,
        cfg.roi2d.threshold_score)
    ref2d_t, ctx_t, keys = tref.build_query2d_ref(
        ref_prop, depth_probs_t, torch.from_numpy(feat_aligned),
        torch.from_numpy(l2i), sd, cfg, (h, w))
    assert len(keys) > len(ref_prop[0]['flat_idx'])   # extras exercised

    s = max(cfg.head.multi_depth.topk, 1)
    my_index = {}
    cam_idx = np.asarray(mine_prop['cam_idx'][0])
    flat_idx = np.asarray(mine_prop['flat_idx'][0])
    for k in range(cfg.roi2d.num_proposals_2d):
        for si in range(s):
            my_index[(int(cam_idx[k]), int(flat_idx[k]), si)] = k * s + si
    ref_np = np.asarray(ref[0])
    ctx_np = np.asarray(ctx[0])
    valid_np = np.asarray(valid[0])
    matched = np.zeros(len(valid_np), bool)
    for j, key in enumerate(keys):
        i = my_index[key]
        assert valid_np[i], key
        matched[i] = True
        np.testing.assert_allclose(ref_np[i], ref2d_t[0, j].numpy(),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(ctx_np[i], ctx_t[0, j].numpy(), **TOL)
    # every valid slot of ours corresponds to a reference query
    assert (matched == valid_np).all()


# ---------------------------------------------------------------- decoder

def test_decoder_layer_composed(setup):
    """One full decoder layer: MHA with temporal keys + camera-modulated
    deformable aggregation + FFN + norms (detr3d_transformer.py:311-422,
    483-569)."""
    cfg, _, sd, converted = setup
    from far3d_tpu.models.decoder import DecoderLayer
    rng = np.random.default_rng(4)
    n = cfg.data.num_cams
    h, w = cfg.data.input_hw
    c = cfg.head.embed_dims
    shapes = level_shapes(cfg)
    lt = sum(hh * ww for hh, ww in shapes)
    q, mem = 30, 12

    query = rng.standard_normal((1, q, c)).astype(np.float32)
    query_pos = rng.standard_normal((1, q, c)).astype(np.float32)
    temp_memory = rng.standard_normal((1, mem, c)).astype(np.float32)
    temp_pos = rng.standard_normal((1, mem, c)).astype(np.float32)
    feat = rng.standard_normal((n, lt, c)).astype(np.float32)
    refp = rng.uniform(0.1, 0.9, (1, q, 3)).astype(np.float32)
    intr, extr = ring_cameras(n, h, w)
    l2i = np.einsum('nij,njk->nik', intr, extr).astype(np.float32)[None]
    mask = rng.random((q, q + mem)) < 0.15

    layer = DecoderLayer(cfg.decoder, cfg.deform, shapes, (h, w), cfg.pc_range)
    params = converted['params']['pts_head']['decoder']['layer0']
    ours = layer.apply({'params': params}, jnp.asarray(query),
                       jnp.asarray(query_pos), jnp.asarray(feat),
                       jnp.asarray(temp_memory), jnp.asarray(temp_pos),
                       jnp.asarray(refp), jnp.asarray(l2i),
                       jnp.asarray(mask))
    ref = tref.decoder_layer(
        torch.from_numpy(query), torch.from_numpy(query_pos),
        torch.from_numpy(feat), torch.from_numpy(temp_memory),
        torch.from_numpy(temp_pos), torch.from_numpy(refp),
        torch.from_numpy(l2i), torch.from_numpy(mask), sd,
        'pts_bbox_head.transformer.decoder.layers.0', cfg, shapes, (h, w))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), **TOL)


# ---------------------------------------------------------------- FarHead

def _se3(yaw, t):
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = m[1, 1] = np.cos(yaw)
    m[0, 1], m[1, 0] = -np.sin(yaw), np.sin(yaw)
    m[:3, 3] = t
    return m


def test_farhead_two_frame_composed(setup):
    """FarHead's full two-frame forward: DN mask, 2D->3D lift, temporal
    alignment, decode and memory update (farhead.py:533-693, 284-313,
    446-508), against the functional torch reference."""
    cfg, _, sd, converted = setup
    rng = np.random.default_rng(5)
    n = cfg.data.num_cams
    h, w = cfg.data.input_hw
    h8, w8 = h // cfg.depthnet.stride, w // cfg.depthnet.stride
    c = cfg.head.embed_dims
    shapes = level_shapes(cfg)
    lt = sum(hh * ww for hh, ww in shapes)
    pad = cfg.head.dn_groups * cfg.head.dn_max_gt * cfg.head.num_smp_per_gt
    k2d_static = cfg.roi2d.num_proposals_2d * cfg.head.multi_depth.topk

    intr, extr = ring_cameras(n, h, w)
    l2i = np.einsum('nij,njk->nik', intr, extr).astype(np.float32)[None]
    intr4 = intr[None]
    extr4 = extr[None]
    ego1 = _se3(0.03, [1.5, 0.2, 0.0])
    ego1_inv = np.linalg.inv(ego1).astype(np.float32)

    head = FarHead(cfg.head, cfg.decoder, cfg.deform, cfg.depthnet,
                   cfg.pc_range, shapes, (h, w), cfg.roi2d.threshold_score)
    params = {'params': converted['params']['pts_head']}

    m_valid = 20
    state_j = init_state(1, cfg.head)
    state_t = tref.zero_state(1, cfg)

    apply = jax.jit(lambda variables, **kw: head.apply(variables, **kw))

    for frame, (prev, ts, ego) in enumerate(
            [(0.0, 100.0, np.eye(4, dtype=np.float32)), (1.0, 100.5, ego1)]):
        ego_inv = np.linalg.inv(ego).astype(np.float32)
        feat = rng.standard_normal((n, lt, c)).astype(np.float32)
        depth_logit = rng.standard_normal(
            (n, h8 * w8, cfg.depthnet.num_depth_bins + 1)).astype(np.float32)
        depth_probs = torch.from_numpy(depth_logit).softmax(-1).numpy()
        dn_ref = rng.uniform(0, 1, (1, pad, 3)).astype(np.float32)

        # synthetic static proposals: m_valid valid + padding
        k = cfg.roi2d.num_proposals_2d
        cam_idx = rng.integers(0, n, k).astype(np.int32)
        flat_idx = rng.choice(lt, size=k, replace=False).astype(np.int32)
        boxes = np.stack([rng.uniform(2, w - 2, k), rng.uniform(2, h - 2, k),
                          rng.uniform(4, 40, k), rng.uniform(4, 40, k)],
                         axis=-1).astype(np.float32)
        scores = rng.uniform(0.15, 0.9, (k, 1)).astype(np.float32)
        valid = np.zeros(k, bool)
        valid[:m_valid] = True
        scores[~valid] = 0.01
        proposals = {
            'boxes': jnp.asarray(boxes)[None],
            'scores': jnp.asarray(scores)[None],
            'cam_idx': jnp.asarray(cam_idx)[None],
            'flat_idx': jnp.asarray(flat_idx)[None],
            'valid': jnp.asarray(valid)[None],
        }
        ref_prop = []
        for cam in range(n):
            sel = valid & (cam_idx == cam)
            order = np.argsort(flat_idx[sel])     # reference flat order
            ref_prop.append({
                'boxes': torch.from_numpy(boxes[sel][order]),
                'scores': torch.from_numpy(scores[sel][order]),
                'flat_idx': torch.from_numpy(flat_idx[sel][order].astype(np.int64)),
            })

        ours = apply(
            params, feat_flatten=jnp.asarray(feat),
            lidar2img=jnp.asarray(l2i), intrinsics=jnp.asarray(intr4),
            extrinsics=jnp.asarray(extr4), state=state_j,
            prev_exists=jnp.asarray([prev]), timestamp=jnp.asarray([ts]),
            ego_pose=jnp.asarray(ego)[None],
            ego_pose_inv=jnp.asarray(ego_inv)[None],
            proposals=proposals,
            depth_probs=jnp.asarray(depth_probs)[None],
            dn_ref_points=jnp.asarray(dn_ref),
            dn_valid=jnp.ones((1, pad), bool))
        state_j = ours['state']

        data = {
            'prev_exists': torch.tensor([prev]),
            'timestamp': torch.tensor([ts]),
            'ego_pose': torch.from_numpy(ego.astype(np.float32))[None],
            'ego_pose_inv': torch.from_numpy(ego_inv)[None],
            'intrinsics': torch.from_numpy(intr4),
            'extrinsics': torch.from_numpy(extr4),
            'lidar2img': torch.from_numpy(l2i),
            'feat_flatten': torch.from_numpy(feat),
            'pad_hw': (h, w),
            'shapes': shapes,
        }
        ref = tref.farhead_forward(
            sd, cfg, data, state_t, proposals=ref_prop,
            depth_probs=torch.from_numpy(depth_probs).reshape(n, h8, w8, -1),
            dn_ref_points=torch.from_numpy(dn_ref))
        state_t = ref['state']

        # permutation over 2D-proposal queries
        s = cfg.head.multi_depth.topk
        perm = []
        my_index = {(int(cam_idx[kk]), int(flat_idx[kk]), si): kk * s + si
                    for kk in range(k) for si in range(s)}
        for key in ref['keys2d']:
            perm.append(my_index[key])
        perm = np.asarray(perm, np.int64)
        nq = cfg.head.num_query

        for name in ('all_cls_scores', 'all_bbox_preds'):
            a = np.asarray(ours[name])            # (L, 1, nq+k2d+np, ...)
            r = ref[name].numpy()
            tol = dict(rtol=1e-3, atol=5e-3)
            np.testing.assert_allclose(a[:, :, :nq], r[:, :, :nq],
                                       err_msg=f'{name} learned f{frame}',
                                       **tol)
            np.testing.assert_allclose(
                a[:, :, nq + perm], r[:, :, nq:nq + ref['k2d']],
                err_msg=f'{name} 2d f{frame}', **tol)
            np.testing.assert_allclose(
                a[:, :, nq + k2d_static:], r[:, :, nq + ref['k2d']:],
                err_msg=f'{name} propagated f{frame}', **tol)
        for name in ('dn_cls_scores', 'dn_bbox_preds'):
            np.testing.assert_allclose(np.asarray(ours[name]),
                                       ref[name].numpy(),
                                       err_msg=f'{name} f{frame}',
                                       rtol=1e-3, atol=5e-3)
        for f in ('embedding', 'ref_points', 'timestamp', 'egopose', 'velo'):
            np.testing.assert_allclose(np.asarray(getattr(state_j, f)),
                                       state_t[f].numpy(),
                                       err_msg=f'state.{f} f{frame}',
                                       rtol=1e-3, atol=5e-3)


# ------------------------------------------------------------- full model

def test_full_model_composed(setup):
    """backbone -> FPN -> YOLOX/depth -> proposals -> FarHead as one unit:
    the complete converted-checkpoint inference path vs the functional torch
    reference (far3d.py forward chain)."""
    cfg, _, sd, converted = setup
    rng = np.random.default_rng(7)
    n = cfg.data.num_cams
    h, w = cfg.data.input_hw
    h8, w8 = h // cfg.depthnet.stride, w // cfg.depthnet.stride
    pad = cfg.head.dn_groups * cfg.head.dn_max_gt * cfg.head.num_smp_per_gt
    s = cfg.head.multi_depth.topk
    k = cfg.roi2d.num_proposals_2d
    shapes = level_shapes(cfg)

    intr, extr = ring_cameras(n, h, w)
    l2i = np.einsum('nij,njk->nik', intr, extr).astype(np.float32)[None]
    images = (rng.standard_normal((1, n, h, w, 3)) * 0.5).astype(np.float32)
    dn_ref = rng.uniform(0, 1, (1, pad, 3)).astype(np.float32)

    model = Far3D(cfg)
    state = init_state(1, cfg.head)
    ours = jax.jit(model.apply)(
        converted, images=jnp.asarray(images), lidar2img=jnp.asarray(l2i),
        intrinsics=jnp.asarray(intr)[None], extrinsics=jnp.asarray(extr)[None],
        state=state, prev_exists=jnp.zeros((1,)),
        timestamp=jnp.asarray([10.0]),
        ego_pose=jnp.tile(jnp.eye(4)[None], (1, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (1, 1, 1)),
        dn_ref_points=jnp.asarray(dn_ref),
        dn_valid=jnp.ones((1, pad), bool))

    # --- torch pipeline ---
    x = _nchw(images[0])
    stages = tref.vovnet_forward(x, sd, cfg)
    feats = tref.fpn_forward(stages, sd, cfg)
    outs2d = tref.yolox_forward(feats, sd, cfg)
    ref_prop = tref.select_proposals_ref(outs2d, cfg)
    depth_probs = outs2d['depth_logit'].permute(0, 2, 3, 1).softmax(-1)
    feat_flatten = torch.cat(
        [f.flatten(2).transpose(1, 2) for f in feats], dim=1)

    n_ref = sum(len(p['flat_idx']) for p in ref_prop)
    assert 0 < n_ref < k, n_ref

    data = {
        'prev_exists': torch.zeros(1),
        'timestamp': torch.tensor([10.0]),
        'ego_pose': torch.eye(4)[None],
        'ego_pose_inv': torch.eye(4)[None],
        'intrinsics': torch.from_numpy(intr)[None],
        'extrinsics': torch.from_numpy(extr)[None],
        'lidar2img': torch.from_numpy(l2i),
        'feat_flatten': feat_flatten,
        'pad_hw': (h, w),
        'shapes': shapes,
    }
    ref = tref.farhead_forward(
        sd, cfg, data, tref.zero_state(1, cfg), proposals=ref_prop,
        depth_probs=depth_probs.reshape(n, h8, w8, -1),
        dn_ref_points=torch.from_numpy(dn_ref))

    # permutation via our actual proposal output
    mine_prop = ours['proposals']
    my_index = {(int(mine_prop['cam_idx'][0, kk]),
                 int(mine_prop['flat_idx'][0, kk]), si): kk * s + si
                for kk in range(k) for si in range(s)}
    perm = np.asarray([my_index[key] for key in ref['keys2d']], np.int64)
    nq = cfg.head.num_query
    k2d_static = k * s

    tol = dict(rtol=2e-3, atol=8e-3)   # deepest composition: widest tolerance
    for name in ('all_cls_scores', 'all_bbox_preds'):
        a = np.asarray(ours[name])
        r = ref[name].numpy()
        np.testing.assert_allclose(a[:, :, :nq], r[:, :, :nq],
                                   err_msg=f'{name} learned', **tol)
        np.testing.assert_allclose(a[:, :, nq + perm],
                                   r[:, :, nq:nq + ref['k2d']],
                                   err_msg=f'{name} 2d', **tol)
        np.testing.assert_allclose(a[:, :, nq + k2d_static:],
                                   r[:, :, nq + ref['k2d']:],
                                   err_msg=f'{name} propagated', **tol)
    for f in ('embedding', 'ref_points', 'timestamp', 'egopose', 'velo'):
        np.testing.assert_allclose(np.asarray(getattr(ours['state'], f)),
                                   ref['state'][f].numpy(),
                                   err_msg=f'state.{f}', **tol)
