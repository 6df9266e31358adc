"""Numeric parity against PyTorch reference semantics.

Each test builds a small torch computation following the reference
implementation (cited per test), assigns random weights, maps them onto our
flax modules (through utils.torch_convert where a checkpoint mapping exists),
and asserts activation equality. This is the harness that catches silent
layout/padding/eps mismatches that would corrupt converted reference weights
(e.g. the stride-2 SAME-vs-padding=1 bug fixed in round 2).

Reference anchors: vovnet.py:124-141 (conv3x3 padding=1), vovnet.py:249
(ceil_mode maxpool), vovnet.py:164-185 (Hsigmoid eSE), mmdet FPN semantics,
misc.py:153-190 (MLN), torch nn.MultiheadAttention packed in_proj.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import flax.linen as nn

from far3d_tpu.config import tiny_test_config
from far3d_tpu.models.layers import MLN, ConvBNReLU, GroupNormConv
from far3d_tpu.models.vovnet import FPN, VoVNet
from far3d_tpu.utils.torch_convert import _transform, convert_state_dict

TOL = dict(atol=3e-5, rtol=1e-4)


# ---------------------------------------------------------------- helpers

def _conv_bn_weights(rng, cin, cout, k=3):
    return {
        'conv.weight': (rng.standard_normal((cout, cin, k, k)) * 0.2
                        ).astype(np.float32),
        'norm.weight': rng.uniform(0.5, 1.5, cout).astype(np.float32),
        'norm.bias': (rng.standard_normal(cout) * 0.1).astype(np.float32),
        'norm.running_mean': (rng.standard_normal(cout) * 0.1
                              ).astype(np.float32),
        'norm.running_var': rng.uniform(0.5, 1.5, cout).astype(np.float32),
    }


def _torch_conv_bn_relu(x, p, stride=1, relu=True):
    w = torch.from_numpy(p['conv.weight'])
    pad = (w.shape[-1] - 1) // 2
    x = F.conv2d(x, w, stride=stride, padding=pad)
    x = F.batch_norm(x, torch.from_numpy(p['norm.running_mean']),
                     torch.from_numpy(p['norm.running_var']),
                     torch.from_numpy(p['norm.weight']),
                     torch.from_numpy(p['norm.bias']),
                     training=False, eps=1e-5)
    return F.relu(x) if relu else x


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _nhwc(x_t):
    return np.transpose(x_t.detach().numpy(), (0, 2, 3, 1))


# ---------------------------------------------------------------- tests

@pytest.mark.parametrize('stride', [1, 2])
def test_conv_bn_relu_matches_torch(stride):
    """ConvBNReLU vs torch Conv2d(padding=1)+BN(eval)+ReLU — the stride-2 /
    even-input case is exactly the round-1 parity bug (XLA SAME pads (0,1),
    torch pads (1,1); reference vovnet.py:124-141)."""
    rng = np.random.default_rng(0)
    p = _conv_bn_weights(rng, 3, 16)
    x = rng.standard_normal((2, 16, 24, 3)).astype(np.float32)

    ref = _torch_conv_bn_relu(_nchw(x), p, stride=stride)

    mod = ConvBNReLU(16, kernel=3, stride=stride)
    variables = {
        'params': {'conv': {'kernel': np.transpose(p['conv.weight'],
                                                   (2, 3, 1, 0))},
                   'bn': {'scale': p['norm.weight'],
                          'bias': p['norm.bias']}},
        'stats': {'bn': {'mean': p['norm.running_mean'],
                         'var': p['norm.running_var']}},
    }
    ours = mod.apply(jax.tree_util.tree_map(jnp.asarray, variables),
                     jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(ref), **TOL)


def test_vovnet_backbone_matches_torch():
    """Full tiny VoVNet (stem strides 2/1/2, ceil-mode maxpool, OSA concat +
    eSE Hsigmoid gate) vs a functional torch reimplementation of reference
    vovnet.py:188-360, wired through convert_state_dict's key mapping."""
    cfg = tiny_test_config()
    bc = cfg.backbone
    rng = np.random.default_rng(1)
    sd = {}

    def add_conv_bn(prefix, cin, cout, k=3):
        p = _conv_bn_weights(rng, cin, cout, k)
        for key, v in p.items():
            sd[f'{prefix}/{key}'] = v
        return p

    stem = [add_conv_bn('img_backbone.stem.stem_1', 3, bc.stem_channels[0]),
            add_conv_bn('img_backbone.stem.stem_2', bc.stem_channels[0],
                        bc.stem_channels[1]),
            add_conv_bn('img_backbone.stem.stem_3', bc.stem_channels[1],
                        bc.stem_channels[2])]

    osa = {}
    in_ch = bc.stem_channels[2]
    for si, nblocks in enumerate(bc.blocks_per_stage):
        s = si + 2
        for b in range(nblocks):
            ref = f'img_backbone.stage{s}.OSA{s}_{b + 1}'
            layers = []
            cin = in_ch if b == 0 else bc.stage_out_channels[si]
            block_in = cin
            for i in range(bc.layers_per_block):
                layers.append(add_conv_bn(
                    f'{ref}.layers.{i}.OSA{s}_{b + 1}_{i}',
                    cin, bc.stage_conv_channels[si]))
                cin = bc.stage_conv_channels[si]
            concat_ch = block_in + bc.layers_per_block * bc.stage_conv_channels[si]
            concat = add_conv_bn(f'{ref}.concat.OSA{s}_{b + 1}_concat',
                                 concat_ch, bc.stage_out_channels[si], k=1)
            oc = bc.stage_out_channels[si]
            ese_w = (rng.standard_normal((oc, oc, 1, 1)) * 0.2).astype(np.float32)
            ese_b = (rng.standard_normal(oc) * 0.1).astype(np.float32)
            sd[f'{ref}.ese.fc.weight'] = ese_w
            sd[f'{ref}.ese.fc.bias'] = ese_b
            osa[(s, b)] = (layers, concat, ese_w, ese_b)
        in_ch = bc.stage_out_channels[si]

    # ---- torch forward (reference semantics) ----
    x_np = np.random.default_rng(2).standard_normal(
        (1, 64, 96, 3)).astype(np.float32)
    t = _nchw(x_np)
    t = _torch_conv_bn_relu(t, stem[0], stride=2)
    t = _torch_conv_bn_relu(t, stem[1], stride=1)
    t = _torch_conv_bn_relu(t, stem[2], stride=2)
    ref_outs = []
    for si, nblocks in enumerate(bc.blocks_per_stage):
        s = si + 2
        if s != 2:
            t = F.max_pool2d(t, 3, stride=2, ceil_mode=True)
        for b in range(nblocks):
            layers, concat, ese_w, ese_b = osa[(s, b)]
            identity = t
            feats = [t]
            for p in layers:
                t = _torch_conv_bn_relu(t, p)
                feats.append(t)
            t = torch.cat(feats, dim=1)
            t = _torch_conv_bn_relu(t, concat)
            gate = t.mean(dim=(2, 3), keepdim=True)
            gate = F.conv2d(gate, torch.from_numpy(ese_w),
                            torch.from_numpy(ese_b))
            gate = F.relu6(gate + 3.0) / 6.0        # Hsigmoid (vovnet.py:164-170)
            t = t * gate
            if b > 0:
                t = t + identity
        ref_outs.append(t)

    # ---- ours, weights via the checkpoint converter ----
    model = VoVNet(bc)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    wrapped = {'params': {'backbone': variables['params']},
               'stats': {'backbone': variables['stats']}}
    converted, _ = convert_state_dict(sd, cfg, wrapped)
    ours = model.apply({'params': converted['params']['backbone'],
                        'stats': converted['stats']['backbone']},
                       jnp.asarray(x_np))
    assert len(ours) == len(ref_outs)
    for o, r in zip(ours, ref_outs):
        np.testing.assert_allclose(np.asarray(o), _nhwc(r), **TOL)


def test_fpn_matches_torch():
    """FPN (start_level=1, nearest top-down, extra stride-2 conv on output)
    vs functional torch mmdet-FPN semantics (far3d.py:50-57)."""
    cfg = tiny_test_config()
    nc = cfg.neck
    rng = np.random.default_rng(3)
    n_used = len(nc.in_channels) - nc.start_level
    sd = {}
    lat, fpn = [], []
    for i in range(n_used):
        cin = nc.in_channels[nc.start_level + i]
        w = (rng.standard_normal((nc.out_channels, cin, 1, 1)) * 0.2
             ).astype(np.float32)
        b = (rng.standard_normal(nc.out_channels) * 0.1).astype(np.float32)
        sd[f'img_neck.lateral_convs.{i}.conv.weight'] = w
        sd[f'img_neck.lateral_convs.{i}.conv.bias'] = b
        lat.append((w, b))
    for i in range(nc.num_outs):
        cin = nc.out_channels
        w = (rng.standard_normal((nc.out_channels, cin, 3, 3)) * 0.1
             ).astype(np.float32)
        b = (rng.standard_normal(nc.out_channels) * 0.1).astype(np.float32)
        sd[f'img_neck.fpn_convs.{i}.conv.weight'] = w
        sd[f'img_neck.fpn_convs.{i}.conv.bias'] = b
        fpn.append((w, b))

    shapes = [(16, 24), (8, 12), (4, 6), (2, 3)]
    inputs = [np.random.default_rng(10 + i).standard_normal(
        (1, h, w, c)).astype(np.float32)
        for i, ((h, w), c) in enumerate(zip(shapes, nc.in_channels))]

    # torch forward
    used = [_nchw(x) for x in inputs[nc.start_level:]]
    laterals = [F.conv2d(used[i], torch.from_numpy(lat[i][0]),
                         torch.from_numpy(lat[i][1])) for i in range(n_used)]
    for i in range(n_used - 1, 0, -1):
        laterals[i - 1] = laterals[i - 1] + F.interpolate(
            laterals[i], scale_factor=2, mode='nearest')
    ref_outs = [F.conv2d(laterals[i], torch.from_numpy(fpn[i][0]),
                         torch.from_numpy(fpn[i][1]), padding=1)
                for i in range(n_used)]
    src = ref_outs[-1]
    for i in range(n_used, nc.num_outs):
        if i > n_used and nc.relu_before_extra_convs:
            src = F.relu(src)
        src = F.conv2d(src, torch.from_numpy(fpn[i][0]),
                       torch.from_numpy(fpn[i][1]), stride=2, padding=1)
        ref_outs.append(src)

    model = FPN(nc)
    variables = model.init(jax.random.PRNGKey(0),
                           [jnp.asarray(x) for x in inputs])
    wrapped = {'params': {'neck': variables['params']}}
    converted, _ = convert_state_dict(sd, cfg, wrapped)
    ours = model.apply({'params': converted['params']['neck']},
                       [jnp.asarray(x) for x in inputs])
    for o, r in zip(ours, ref_outs):
        np.testing.assert_allclose(np.asarray(o), _nhwc(r), **TOL)


def test_mln_matches_torch():
    """MLN (meta LayerNorm) vs the reference misc.py:153-190: affine-free
    LayerNorm(eps=1e-5), gamma/beta predicted from the conditioning code."""
    rng = np.random.default_rng(4)
    fd, cd = 32, 12
    wr = rng.standard_normal((fd, cd)).astype(np.float32) * 0.2
    br = rng.standard_normal(fd).astype(np.float32) * 0.1
    wg = rng.standard_normal((fd, fd)).astype(np.float32) * 0.2
    bg = rng.standard_normal(fd).astype(np.float32) * 0.1
    wb = rng.standard_normal((fd, fd)).astype(np.float32) * 0.2
    bb = rng.standard_normal(fd).astype(np.float32) * 0.1
    x = rng.standard_normal((2, 5, fd)).astype(np.float32)
    c = rng.standard_normal((2, 5, cd)).astype(np.float32)

    xt, ct = torch.from_numpy(x), torch.from_numpy(c)
    h = F.relu(F.linear(ct, torch.from_numpy(wr), torch.from_numpy(br)))
    gamma = F.linear(h, torch.from_numpy(wg), torch.from_numpy(bg))
    beta = F.linear(h, torch.from_numpy(wb), torch.from_numpy(bb))
    ref = gamma * F.layer_norm(xt, (fd,), eps=1e-5) + beta

    params = {'reduce': {'kernel': wr.T, 'bias': br},
              'gamma': {'kernel': wg.T, 'bias': bg},
              'beta': {'kernel': wb.T, 'bias': bb}}
    ours = MLN(f_dim=fd).apply(
        {'params': jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), **TOL)


def test_mha_matches_torch():
    """flax MultiHeadDotProductAttention with converter-split packed in_proj
    weights vs torch nn.MultiheadAttention (decoder self-attn,
    detr3d_transformer.py:377-396)."""
    heads, c = 4, 32
    rng = np.random.default_rng(5)
    ipw = rng.standard_normal((3 * c, c)).astype(np.float32) * 0.2
    ipb = rng.standard_normal(3 * c).astype(np.float32) * 0.1
    opw = rng.standard_normal((c, c)).astype(np.float32) * 0.2
    opb = rng.standard_normal(c).astype(np.float32) * 0.1
    q = rng.standard_normal((2, 6, c)).astype(np.float32)
    k = rng.standard_normal((2, 9, c)).astype(np.float32)
    v = rng.standard_normal((2, 9, c)).astype(np.float32)

    tmha = torch.nn.MultiheadAttention(c, heads, batch_first=True)
    with torch.no_grad():
        tmha.in_proj_weight.copy_(torch.from_numpy(ipw))
        tmha.in_proj_bias.copy_(torch.from_numpy(ipb))
        tmha.out_proj.weight.copy_(torch.from_numpy(opw))
        tmha.out_proj.bias.copy_(torch.from_numpy(opb))
    tmha.eval()
    with torch.no_grad():
        ref, _ = tmha(torch.from_numpy(q), torch.from_numpy(k),
                      torch.from_numpy(v), need_weights=False)

    params = {}
    for part, off in (('query', 0), ('key', 1), ('value', 2)):
        params[part] = {
            'kernel': _transform(ipw, f'mha_qkv_w{off}_{heads}'),
            'bias': _transform(ipb, f'mha_qkv_b{off}_{heads}')}
    params['out'] = {'kernel': _transform(opw, f'mha_out_w_{heads}'),
                     'bias': opb}
    mod = nn.MultiHeadDotProductAttention(
        num_heads=heads, qkv_features=c, out_features=c, dropout_rate=0.0)
    ours = mod.apply({'params': jax.tree_util.tree_map(jnp.asarray, params)},
                     jnp.asarray(q), inputs_k=jnp.asarray(k),
                     inputs_v=jnp.asarray(v), deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), **TOL)


def test_second_fpn_matches_torch():
    """SECONDFPN vs functional torch CustomSECONDFPN semantics
    (second_fpn.py:44-111): deconv(k=s, no bias) / kernel-1 deconv at s==1 /
    strided conv at s<1, BN(eval, eps=1e-3), ReLU, concat, final conv."""
    from far3d_tpu.models.second_fpn import SECONDFPN

    rng = np.random.default_rng(7)
    in_ch = (8, 12, 16)
    out_ch = (8, 8, 8)
    strides = (0.5, 1, 2)
    final_dim = 10
    shapes = [(16, 12), (8, 6), (4, 3)]
    xs = [rng.standard_normal((2, h, w, c)).astype(np.float32)
          for (h, w), c in zip(shapes, in_ch)]

    ups = []
    params = {}
    stats = {}

    def bn_params(i, oc, prefix):
        p = {'scale': rng.uniform(0.5, 1.5, oc).astype(np.float32),
             'bias': (rng.standard_normal(oc) * 0.1).astype(np.float32)}
        s = {'mean': (rng.standard_normal(oc) * 0.1).astype(np.float32),
             'var': rng.uniform(0.5, 1.5, oc).astype(np.float32)}
        params[prefix] = p
        stats[prefix] = s
        return p, s

    def bn_eval(t, p, s):
        return F.batch_norm(t, torch.from_numpy(s['mean']),
                            torch.from_numpy(s['var']),
                            torch.from_numpy(p['scale']),
                            torch.from_numpy(p['bias']),
                            training=False, eps=1e-3)

    for i, (x, s, oc) in enumerate(zip(xs, strides, out_ch)):
        t = _nchw(x)
        if s > 1:
            st = int(s)
            w = (rng.standard_normal((in_ch[i], oc, st, st)) * 0.2
                 ).astype(np.float32)
            t = F.conv_transpose2d(t, torch.from_numpy(w), stride=st)
            # torch deconv (in, out, kh, kw) -> flax (kh, kw, in, out),
            # spatially flipped (lax.conv_transpose, transpose_kernel=False)
            params[f'deblock{i}_conv'] = {
                'kernel': np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()}
        elif s == 1:
            w = (rng.standard_normal((in_ch[i], oc, 1, 1)) * 0.2
                 ).astype(np.float32)
            t = F.conv_transpose2d(t, torch.from_numpy(w), stride=1)
            params[f'deblock{i}_conv'] = {
                'kernel': np.transpose(w, (2, 3, 0, 1))}
        else:
            st = int(round(1 / s))
            w = (rng.standard_normal((oc, in_ch[i], st, st)) * 0.2
                 ).astype(np.float32)
            t = F.conv2d(t, torch.from_numpy(w), stride=st)
            params[f'deblock{i}_conv'] = {
                'kernel': np.transpose(w, (2, 3, 1, 0))}
        p, st_ = bn_params(i, oc, f'deblock{i}_bn')
        t = F.relu(bn_eval(t, p, st_))
        ups.append(t)
    ref = torch.cat(ups, dim=1)
    half = sum(out_ch) // 2
    wf0 = (rng.standard_normal((half, sum(out_ch), 3, 3)) * 0.1
           ).astype(np.float32)
    params['final_conv0'] = {'kernel': np.transpose(wf0, (2, 3, 1, 0))}
    pf, sf = bn_params(99, half, 'final_bn')
    wf1 = (rng.standard_normal((final_dim, half, 1, 1)) * 0.2
           ).astype(np.float32)
    params['final_conv1'] = {'kernel': np.transpose(wf1, (2, 3, 1, 0))}
    ref = F.conv2d(ref, torch.from_numpy(wf0), padding=1)
    ref = F.relu(bn_eval(ref, pf, sf))
    ref = F.conv2d(ref, torch.from_numpy(wf1))

    mod = SECONDFPN(in_channels=in_ch, out_channels=out_ch,
                    upsample_strides=strides, final_conv_feature_dim=final_dim)
    variables = {'params': jax.tree_util.tree_map(jnp.asarray, params),
                 'stats': jax.tree_util.tree_map(jnp.asarray, stats)}
    outs = mod.apply(variables, [jnp.asarray(x) for x in xs])
    assert len(outs) == 1
    np.testing.assert_allclose(np.asarray(outs[0]), _nhwc(ref), **TOL)


def test_groupnorm_conv_matches_torch():
    """GroupNormConv vs torch conv(pad=1,bias)+GroupNorm(eps=1e-5)+ReLU
    (depth_predictor.py:41-44)."""
    rng = np.random.default_rng(6)
    cin, cout, groups = 8, 8, 4
    w = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.2
    b = rng.standard_normal(cout).astype(np.float32) * 0.1
    gw = rng.uniform(0.5, 1.5, cout).astype(np.float32)
    gb = rng.standard_normal(cout).astype(np.float32) * 0.1
    x = rng.standard_normal((2, 10, 14, cin)).astype(np.float32)

    t = F.conv2d(_nchw(x), torch.from_numpy(w), torch.from_numpy(b), padding=1)
    t = F.group_norm(t, groups, torch.from_numpy(gw), torch.from_numpy(gb),
                     eps=1e-5)
    ref = F.relu(t)

    params = {'conv': {'kernel': np.transpose(w, (2, 3, 1, 0)), 'bias': b},
              'gn': {'scale': gw, 'bias': gb}}
    ours = GroupNormConv(cout, groups=groups).apply(
        {'params': jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(ref), **TOL)
