"""VoVNet-99-eSE backbone + FPN neck, NHWC, batched over B*num_cams.

TPU-first re-design of the reference backbone stack:
  * vovnet.py:276-384 (VoVNet) / vovnetcp.py (checkpointed variant) — here a
    single flax implementation with optional `nn.remat` per OSA module.
  * mmdet FPN as configured in far3d.py:50-57 (start_level=1, one extra conv
    'on_output', relu_before_extra_convs, 4 outs, 256 ch).

All 7 cameras are folded into the batch dim so every conv runs as one large
NHWC XLA convolution on the MXU. BatchNorm is frozen (norm_eval=True in the
reference) and folds into the conv epilogue — see layers.FrozenBatchNorm.
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import BackboneConfig, NeckConfig
from .layers import ConvBNReLU


class eSEModule(nn.Module):
    """Effective squeeze-excite with hard-sigmoid gate (vovnet.py:173-185)."""
    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # global average pool over H, W
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels, (1, 1), dtype=x.dtype, name='fc')(s)
        gate = jnp.clip(s + 3.0, 0.0, 6.0) / 6.0  # Hsigmoid (vovnet.py:164-170)
        return x * gate


class OSAModule(nn.Module):
    """One-shot-aggregation block (vovnet.py:188-238): `layer_per_block`
    successive 3x3 convs, concat of input + every intermediate, 1x1 fuse,
    eSE gate, optional identity residual."""
    stage_ch: int
    concat_ch: int
    layers_per_block: int
    identity: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        identity_feat = x
        outputs = [x]
        for i in range(self.layers_per_block):
            x = ConvBNReLU(self.stage_ch, kernel=3, name=f'layer{i}')(x)
            outputs.append(x)
        x = jnp.concatenate(outputs, axis=-1)
        x = ConvBNReLU(self.concat_ch, kernel=1, name='concat')(x)
        x = eSEModule(self.concat_ch, name='ese')(x)
        if self.identity:
            x = x + identity_feat
        return x


def _max_pool_ceil(x: jax.Array) -> jax.Array:
    """3x3 stride-2 max pool with torch ceil_mode semantics (vovnet.py:249).

    For the even spatial dims used here, SAME padding reproduces ceil_mode
    exactly (one implicit -inf pad at bottom/right)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding='SAME')


class VoVNet(nn.Module):
    """VoVNet backbone (V-99-eSE by default). Input NHWC (BN, H, W, 3);
    returns the configured stage outputs at strides 4/8/16/32."""
    cfg: BackboneConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        c = self.cfg
        # stem: 3 convs, strides 2/1/2 (vovnet.py:307-311)
        x = ConvBNReLU(c.stem_channels[0], 3, stride=2, name='stem1')(x)
        x = ConvBNReLU(c.stem_channels[1], 3, stride=1, name='stem2')(x)
        x = ConvBNReLU(c.stem_channels[2], 3, stride=2, name='stem3')(x)

        osa = OSAModule
        if c.remat:
            osa = nn.remat(OSAModule, static_argnums=())

        outputs = []
        for si in range(4):           # stages 2..5
            stage_num = si + 2
            if stage_num != 2:        # stages 3..5 downsample first
                x = _max_pool_ceil(x)
            for bi in range(c.blocks_per_stage[si]):
                x = osa(stage_ch=c.stage_conv_channels[si],
                        concat_ch=c.stage_out_channels[si],
                        layers_per_block=c.layers_per_block,
                        identity=(bi > 0),
                        name=f'stage{stage_num}_block{bi}')(x)
            if stage_num in c.out_stages:
                outputs.append(x)
        return outputs


class FPN(nn.Module):
    """mmdet-style FPN (far3d.py:50-57): start_level=1, 4 outs, extra conv on
    output (no relu before the single extra conv since it is the first one)."""
    cfg: NeckConfig

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]) -> List[jax.Array]:
        c = self.cfg
        used = list(inputs[c.start_level:])
        n_used = len(used)
        laterals = [
            nn.Conv(c.out_channels, (1, 1), dtype=used[i].dtype,
                    name=f'lateral{i}')(used[i])
            for i in range(n_used)
        ]
        # top-down nearest-neighbour upsample + add
        for i in range(n_used - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(laterals[i], 2, axis=1), 2, axis=2)
            # crop in case of odd sizes
            up = up[:, :laterals[i - 1].shape[1], :laterals[i - 1].shape[2], :]
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(c.out_channels, (3, 3), padding='SAME',
                    dtype=laterals[i].dtype, name=f'fpn{i}')(laterals[i])
            for i in range(n_used)
        ]
        # extra levels via stride-2 conv on the last output
        src = outs[-1]
        for i in range(n_used, c.num_outs):
            if i > n_used and c.relu_before_extra_convs:
                src = nn.relu(src)
            # explicit (1,1) padding to match torch padding=1 at stride 2
            # (mmdet FPN extra conv; XLA SAME would pad (0,1) on even inputs)
            src = nn.Conv(c.out_channels, (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)),
                          dtype=src.dtype, name=f'fpn{i}')(src)
            outs.append(src)
        return outs
