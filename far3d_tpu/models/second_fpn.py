"""CustomSECONDFPN neck variant (reference: models/necks/second_fpn.py:12-111).

SECOND-style neck: per-level transposed-conv (or strided-conv downsample)
to a common resolution + channel concat. Registered in the reference but not
used by the shipped Far3D config; provided for model-family parity.

The reference's CPFPN (cp_fpn.py) — an FPN with activation checkpointing and
pruned unused lateral convs — is covered by models/vovnet.py:FPN plus the
global remat options; no separate module is needed on TPU.
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import FrozenBatchNorm


class SECONDFPN(nn.Module):
    """in_channels: per-level inputs; out_channels: per-level outputs;
    upsample_strides > 1 upsample (transposed conv), == 1 keep, < 1 would
    downsample (implemented as strided conv with stride round(1/s))."""
    in_channels: Sequence[int] = (256, 512, 768, 1024)
    out_channels: Sequence[int] = (128, 128, 128, 128)
    upsample_strides: Sequence[float] = (1, 2, 4, 8)
    use_conv_for_no_stride: bool = False

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
                x = nn.Conv(oc, (3, 3), padding='SAME', use_bias=False,
                            dtype=x.dtype, name=f'deblock{i}_conv')(x)
            else:
                st = int(round(1 / s))
                x = nn.Conv(oc, (st, st), strides=(st, st), use_bias=False,
                            dtype=x.dtype, name=f'deblock{i}_conv')(x)
            x = FrozenBatchNorm(oc, name=f'deblock{i}_bn')(x)
            x = nn.relu(x)
            outs.append(x)
        return [jnp.concatenate(outs, axis=-1)]
