"""CustomSECONDFPN neck variant (reference: models/necks/second_fpn.py:12-111).

SECOND-style neck: per-level transposed-conv upsample (or strided-conv
downsample) to a common resolution + channel concat, with an optional final
conv bottleneck. Registered in the reference but not used by the shipped
Far3D config (it serves BEV-style pipelines); provided for model-family
parity and covered by tests/test_torch_parity.py::test_second_fpn_matches_torch.

The reference's CPFPN (cp_fpn.py) — an FPN with activation checkpointing and
pruned unused lateral convs — is covered by models/vovnet.py:FPN plus the
global remat options; no separate module is needed on TPU.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import FrozenBatchNorm


class SECONDFPN(nn.Module):
    """in_channels: per-level inputs; out_channels: per-level outputs.

    upsample_strides s: s > 1 -> ConvTranspose(kernel=s, stride=s); s == 1
    without use_conv_for_no_stride -> kernel-1 deconv (== 1x1 conv, the
    reference's `stride > 1 or (stride == 1 and not use_conv...)` branch);
    s < 1 -> strided conv with kernel = stride = round(1/s). BN eps 1e-3
    (reference norm_cfg)."""
    in_channels: Sequence[int] = (256, 512, 768, 1024)
    out_channels: Sequence[int] = (128, 128, 128, 128)
    upsample_strides: Sequence[float] = (1, 2, 4, 8)
    use_conv_for_no_stride: bool = False
    final_conv_feature_dim: Optional[int] = None

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]) -> List[jax.Array]:
        outs = []
        for i, x in enumerate(inputs):
            s = self.upsample_strides[i]
            oc = self.out_channels[i]
            if s > 1:
                st = int(s)
                x = nn.ConvTranspose(oc, (st, st), strides=(st, st),
                                     use_bias=False, dtype=x.dtype,
                                     name=f'deblock{i}_conv')(x)
            elif s == 1 and not self.use_conv_for_no_stride:
                # reference builds a deconv with kernel=stride=1 here
                x = nn.Conv(oc, (1, 1), use_bias=False, dtype=x.dtype,
                            name=f'deblock{i}_conv')(x)
            else:
                st = int(round(1 / s))
                x = nn.Conv(oc, (st, st), strides=(st, st), use_bias=False,
                            dtype=x.dtype, name=f'deblock{i}_conv')(x)
            x = FrozenBatchNorm(oc, eps=1e-3, name=f'deblock{i}_bn')(x)
            x = nn.relu(x)
            outs.append(x)
        out = jnp.concatenate(outs, axis=-1)
        if self.final_conv_feature_dim is not None:
            half = sum(self.out_channels) // 2
            out = nn.Conv(half, (3, 3), padding=((1, 1), (1, 1)),
                          use_bias=False, dtype=out.dtype,
                          name='final_conv0')(out)
            out = FrozenBatchNorm(half, eps=1e-3, name='final_bn')(out)
            out = nn.relu(out)
            out = nn.Conv(self.final_conv_feature_dim, (1, 1), use_bias=False,
                          dtype=out.dtype, name='final_conv1')(out)
        return [out]
