"""Shared flax.linen building blocks.

TPU-native equivalents of the reference's small modules:
  * MLN (meta LayerNorm, misc.py:153-190)
  * SELayer_Linear (misc.py:138-150)
  * FrozenBatchNorm — the reference runs all backbone BN in eval mode
    (vovnet.py:375-384 `norm_eval=True`), i.e. normalization with fixed running
    stats; gamma/beta remain trainable. We fold that into an affine layer whose
    (mean, var) live in a non-trainable 'stats' collection.
  * FFN (mmcv FFN with residual, detr3d_transformer.py ffn_cfgs)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always normalizes with stored running stats."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mean = self.variable('stats', 'mean',
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable('stats', 'var',
                            lambda: jnp.ones((self.features,), jnp.float32))
        inv = jax.lax.rsqrt(var.value + self.eps) * scale
        # fold into a single multiply-add; XLA fuses this into the conv epilogue
        return x * inv.astype(x.dtype) + (bias - mean.value * inv).astype(x.dtype)


class ConvBNReLU(nn.Module):
    """conv -> frozen BN -> ReLU (vovnet.py conv3x3/conv1x1 blocks)."""
    features: int
    kernel: int = 3
    stride: int = 1
    use_relu: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # torch-style symmetric padding=(k-1)//2. NOT 'SAME': for stride-2 /
        # even input XLA SAME pads (0,1) while torch pads (1,1) — converted
        # reference weights would see shifted windows (vovnet.py:124-141).
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    use_bias=False, dtype=x.dtype, name='conv')(x)
        x = FrozenBatchNorm(self.features, name='bn')(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class GroupNormConv(nn.Module):
    """conv -> GroupNorm(32) [-> ReLU] (depth_predictor.py:41-44)."""
    features: int
    kernel: int = 3
    groups: int = 32
    use_relu: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding='SAME',
                    dtype=x.dtype, name='conv')(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,dtype=x.dtype, name='gn')(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class MLN(nn.Module):
    """Meta LayerNorm: gamma/beta predicted from a conditioning code
    (misc.py:153-190). gamma weight init zeros + bias ones; beta zeros."""
    f_dim: int = 256
    use_ln: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        if self.use_ln:
            x = nn.LayerNorm(epsilon=1e-5,use_bias=False, use_scale=False, dtype=x.dtype,
                             name='ln')(x)
        h = nn.relu(nn.Dense(self.f_dim, dtype=x.dtype, name='reduce')(c))
        gamma = nn.Dense(self.f_dim, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.ones, dtype=x.dtype,
                         name='gamma')(h)
        beta = nn.Dense(self.f_dim, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, dtype=x.dtype,
                        name='beta')(h)
        return gamma * x + beta


class SELayerLinear(nn.Module):
    """Linear squeeze-excite gate (misc.py:138-150)."""
    channels: int

    @nn.compact
    def __call__(self, x: jax.Array, x_se: jax.Array) -> jax.Array:
        h = nn.relu(nn.Dense(self.channels, dtype=x.dtype, name='reduce')(x_se))
        h = nn.Dense(self.channels, dtype=x.dtype, name='expand')(h)
        return x * jax.nn.sigmoid(h)


class MLP(nn.Module):
    """Dense stack with ReLU between layers (e.g. query_embedding farhead.py:268-272)."""
    features: Sequence[int]
    final_act: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=x.dtype, name=f'dense{i}')(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
        if self.final_act is not None:
            x = self.final_act(x)
        return x


class FFN(nn.Module):
    """Transformer FFN with residual (mmcv FFN; ffn_dims=2048, dropout 0.1)."""
    embed_dims: int = 256
    ffn_dims: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        identity = x
        h = nn.Dense(self.ffn_dims, dtype=x.dtype, name='fc1')(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.embed_dims, dtype=x.dtype, name='fc2')(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return identity + h


def bias_init_with_prob(prior_prob: float) -> float:
    """Focal-loss style classifier bias init (mmcv bias_init_with_prob)."""
    import math
    return float(-math.log((1 - prior_prob) / prior_prob))
