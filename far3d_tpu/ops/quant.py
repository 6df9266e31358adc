"""Post-training int8 quantization of the VoVNet backbone (serving mode).

The v5e MXU runs s8 x s8 -> s32 at twice the bf16 rate, and the backbone is
MXU-peak-bound with a tile-padding waste fraction fixed by the reference's
channel widths (docs/PROFILE.md) — so int8 cuts absolute conv time by the
measured 1.2-1.6x per shape (tools/dev_micro_int8.py) where no bf16-level
rewrite could. This module provides the three pieces of a static PTQ path:

1. `calibrate_vovnet`  — per-site activation amax from a few batches, via
   flax intermediate capture on the bf16 model.
2. `build_quant_vovnet` — folds frozen-BN into conv weights, folds each
   conv's per-input-channel scales INTO the weight before per-output-channel
   int8 quantization (so OSA concats of branches with different scales need
   no runtime rescale), and bakes the requantization multipliers.
3. `quant_vovnet_forward` — the runtime: int8 convs with a fused
   scale+ReLU+requantize epilogue, eSE/identity epilogues in float, int8
   activations end to end, stage outputs dequantized to bf16 for the FPN.

Quantization scheme: activations per-tensor (post-ReLU, so the int8 range is
[0, 127]; the signed stem input uses [-127, 127]), weights per-output-channel
symmetric. The reference has no quantized path at all — this is a
beyond-reference TPU serving feature; accuracy impact is bounded with the
closed-loop harness (docs/CLOSED_LOOP.md) rather than asserted.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BackboneConfig

_DN = ('NHWC', 'HWIO', 'NHWC')


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------

def _site_filter(mdl, method_name: str) -> bool:
    return method_name == '__call__' and type(mdl).__name__ in (
        'ConvBNReLU', 'OSAModule')


def calibrate_vovnet(cfg: BackboneConfig, backbone_vars: Dict,
                     batches: Sequence[jax.Array]) -> Dict[str, float]:
    """Run the bf16 VoVNet on calibration batches capturing every
    ConvBNReLU / OSAModule output; returns {site: amax} where site is the
    '/'-joined module path (e.g. 'stage3_block1/layer2', 'stem1',
    'stage4_block0')."""
    from ..models.vovnet import VoVNet

    model = VoVNet(cfg)

    # variables are a jit ARGUMENT: closing over them would embed every
    # weight as a program literal (blows the remote-compile request size on
    # this runtime, and closure constants corrupt pallas programs, CLAUDE.md)
    @jax.jit
    def run(variables, x):
        _, inter = model.apply(variables, x,
                               capture_intermediates=_site_filter)
        flat = {}

        def walk(tree, path):
            for k, v in tree.items():
                if k == '__call__':
                    flat['/'.join(path)] = jnp.max(jnp.abs(
                        v[0].astype(jnp.float32)))
                else:
                    walk(v, path + [k])
        walk(inter['intermediates'], [])
        return flat

    amax: Dict[str, float] = {}
    for x in batches:
        cur = jax.device_get(run(backbone_vars, x))
        for k, v in cur.items():
            amax[k] = max(amax.get(k, 0.0), float(v))
    return amax


def input_scale_from_norm(img_mean: Sequence[float],
                          img_std: Sequence[float]) -> float:
    """Analytic amax of the normalized uint8 image: the stem input needs no
    calibration because its range is exactly ((0|255) - mean) / std."""
    m, s = np.asarray(img_mean), np.asarray(img_std)
    return float(np.max(np.maximum(np.abs(-m / s), np.abs((255 - m) / s)))
                 / 127.0)


# ---------------------------------------------------------------------------
# building the quantized parameter tree
# ---------------------------------------------------------------------------

def _fold_bn(conv_p, bn_p, bn_s, eps: float = 1e-5):
    w = np.asarray(conv_p['kernel'], np.float64)          # (kh, kw, ci, co)
    inv = np.asarray(bn_p['scale'], np.float64) / np.sqrt(
        np.asarray(bn_s['var'], np.float64) + eps)
    return w * inv, np.asarray(bn_p['bias'], np.float64) - \
        np.asarray(bn_s['mean'], np.float64) * inv


def _quantize_conv(w_f, b_f, s_in: np.ndarray, s_out) -> Dict:
    """s_in: per-input-channel activation scales, folded into the weight
    before symmetric per-output-channel quantization. s_out None => float
    output (a = s_w, b = b_f); else the epilogue multipliers are divided by
    s_out so the runtime is `clip(round(relu(acc*a + b)), 0, 127)`."""
    w_s = w_f * s_in[None, None, :, None]
    s_w = np.maximum(np.max(np.abs(w_s), axis=(0, 1, 2)), 1e-12) / 127.0
    w_q = np.clip(np.round(w_s / s_w), -127, 127).astype(np.int8)
    div = 1.0 if s_out is None else s_out
    return dict(w=jnp.asarray(w_q),
                a=jnp.asarray((s_w / div).astype(np.float32)),
                b=jnp.asarray((b_f / div).astype(np.float32)))


def build_quant_vovnet(cfg: BackboneConfig, backbone_vars: Dict,
                       amax: Dict[str, float],
                       img_mean: Sequence[float],
                       img_std: Sequence[float]) -> Dict:
    """Build the quantized parameter pytree (pass it to the forward as a jit
    ARGUMENT — closure-captured device constants corrupt pallas programs on
    this runtime, see CLAUDE.md)."""
    params, stats = backbone_vars['params'], backbone_vars['stats']

    def fold(site_params, site_stats, s_in, s_out):
        w_f, b_f = _fold_bn(site_params['conv'], site_params['bn'],
                            site_stats['bn'])
        return _quantize_conv(w_f, b_f, np.asarray(s_in, np.float64), s_out)

    def scale(site: str) -> float:
        return amax[site] / 127.0

    s0 = input_scale_from_norm(img_mean, img_std)
    q: Dict = {'s0': jnp.float32(s0)}
    cin = 3
    q['stem1'] = fold(params['stem1'], stats['stem1'],
                      np.full(cin, s0), scale('stem1'))
    q['stem2'] = fold(params['stem2'], stats['stem2'],
                      np.full(cfg.stem_channels[0], scale('stem1')),
                      scale('stem2'))
    q['stem3'] = fold(params['stem3'], stats['stem3'],
                      np.full(cfg.stem_channels[1], scale('stem2')),
                      scale('stem3'))

    s_block_in = scale('stem3')
    c_block_in = cfg.stem_channels[2]
    for si in range(4):
        stage = si + 2
        for bi in range(cfg.blocks_per_stage[si]):
            name = f'stage{stage}_block{bi}'
            bp, bs = params[name], stats[name]
            sc, cc = cfg.stage_conv_channels[si], cfg.stage_out_channels[si]
            blk: Dict = {}
            s_cur, c_cur = s_block_in, c_block_in
            cat_scales = [np.full(c_block_in, s_block_in)]
            for li in range(cfg.layers_per_block):
                site = f'{name}/layer{li}'
                blk[f'layer{li}'] = fold(bp[f'layer{li}'], bs[f'layer{li}'],
                                         np.full(c_cur, s_cur), scale(site))
                s_cur, c_cur = scale(site), sc
                cat_scales.append(np.full(sc, s_cur))
            blk['concat'] = fold(bp['concat'], bs['concat'],
                                 np.concatenate(cat_scales), None)
            blk['ese_w'] = jnp.asarray(
                np.asarray(bp['ese']['fc']['kernel'])[0, 0], jnp.float32)
            blk['ese_b'] = jnp.asarray(bp['ese']['fc']['bias'], jnp.float32)
            blk['s_id'] = jnp.float32(s_block_in)       # identity-add scale
            s_out = scale(name)
            blk['r_out'] = jnp.float32(1.0 / s_out)
            q[name] = blk
            s_block_in, c_block_in = s_out, cc
        q[f'stage{stage}_scale'] = jnp.float32(s_block_in)
    return q


def _quantize_backbone(backbone_cfg: BackboneConfig, bb_vars: Dict,
                       img_mean: Sequence[float], img_std: Sequence[float],
                       calib_images: Sequence[jax.Array]) -> Dict:
    mean = jnp.asarray(img_mean, jnp.float32)
    std = jnp.asarray(img_std, jnp.float32)
    batches = []
    for img in calib_images:
        img = jnp.asarray(img)
        if jnp.issubdtype(img.dtype, jnp.integer):
            img = (img.astype(jnp.float32) - mean) / std
        batches.append(img.reshape(-1, *img.shape[-3:]).astype(jnp.bfloat16))
    amax = calibrate_vovnet(backbone_cfg, bb_vars, batches)
    return build_quant_vovnet(backbone_cfg, bb_vars, amax, img_mean, img_std)


def quantize_detector_backbone(cfg, variables,
                               calib_images: Sequence[jax.Array]) -> Dict:
    """One-call serving API: full detector variables + a few image batches
    (uint8 or normalized float, (B, N, H, W, 3)) -> quantized backbone tree.

    Pass the result to `Far3D.apply(..., quant_backbone=tree)` /
    `eval.runner.run_inference(..., quant_tree=tree)` as a jit ARGUMENT.
    """
    bb_vars = {'params': variables['params']['backbone'],
               'stats': variables['stats']['backbone']}
    return _quantize_backbone(cfg.backbone, bb_vars, cfg.data.img_mean,
                              cfg.data.img_std, calib_images)


def quantize_petr_backbone(cfg, variables,
                           calib_images: Sequence[jax.Array]) -> Dict:
    """StreamPETR twin of `quantize_detector_backbone` (the second family
    shares the VoVNet): pass the tree to
    `StreamPETR.apply(..., quant_backbone=tree)` /
    `eval.petr_runner.run_inference_petr(..., quant_tree=tree)`.
    Normalization constants are the module-level IMG_MEAN/IMG_STD the model
    itself applies to integer inputs (models/streampetr.py)."""
    from ..config import IMG_MEAN, IMG_STD
    bb_vars = {'params': variables['params']['backbone'],
               'stats': variables['stats']['backbone']}
    return _quantize_backbone(cfg.backbone, bb_vars, IMG_MEAN, IMG_STD,
                              calib_images)


# ---------------------------------------------------------------------------
# runtime
# ---------------------------------------------------------------------------

def _qconv(qc: Dict, x_q: jax.Array, stride: int = 1,
           float_out: bool = False) -> jax.Array:
    kh = qc['w'].shape[0]
    p = (kh - 1) // 2
    acc = jax.lax.conv_general_dilated(
        x_q, qc['w'], (stride, stride), ((p, p), (p, p)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x_q.shape, qc['w'].shape, _DN),
        preferred_element_type=jnp.int32)
    y = jnp.maximum(acc.astype(jnp.float32) * qc['a'] + qc['b'], 0.0)
    if float_out:
        return y
    return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)


def _qosa(blk: Dict, x_q: jax.Array, layers: int, identity: bool) -> jax.Array:
    outs = [x_q]
    h = x_q
    for li in range(layers):
        h = _qconv(blk[f'layer{li}'], h)
        outs.append(h)
    cat = jnp.concatenate(outs, axis=-1)
    y = _qconv(blk['concat'], cat, float_out=True)            # f32, post-ReLU
    # eSE in float (measured free at bf16; it is a (1,1,C) matmul + gate)
    s = jnp.mean(y, axis=(1, 2), keepdims=True)
    g = jnp.einsum('bijc,cd->bijd', s, blk['ese_w']) + blk['ese_b']
    y = y * (jnp.clip(g + 3.0, 0.0, 6.0) / 6.0)
    if identity:
        y = y + x_q.astype(jnp.float32) * blk['s_id']
    return jnp.clip(jnp.round(y * blk['r_out']), 0, 127).astype(jnp.int8)


def quantize_input(x: jax.Array, s0: jax.Array) -> jax.Array:
    """Normalized image (float) -> signed int8."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s0),
                    -127, 127).astype(jnp.int8)


def quant_vovnet_forward(cfg: BackboneConfig, q: Dict,
                         x_q: jax.Array) -> List[jax.Array]:
    """int8 twin of models/vovnet.py:VoVNet.__call__; returns the configured
    stage outputs dequantized to bf16."""
    x = _qconv(q['stem1'], x_q, stride=2)
    x = _qconv(q['stem2'], x)
    x = _qconv(q['stem3'], x, stride=2)
    outputs = []
    for si in range(4):
        stage = si + 2
        if stage != 2:
            x = jax.lax.reduce_window(
                x, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                'SAME')
        for bi in range(cfg.blocks_per_stage[si]):
            x = _qosa(q[f'stage{stage}_block{bi}'], x, cfg.layers_per_block,
                      identity=(bi > 0))
        if stage in cfg.out_stages:
            outputs.append((x.astype(jnp.float32)
                            * q[f'stage{stage}_scale']).astype(jnp.bfloat16))
    return outputs
