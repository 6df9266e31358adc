"""Detr3D temporal decoder with perspective-aware aggregation.

Reference: models/utils/detr3d_transformer.py —
  * DeformableFeatureAggregationCuda (:483-569)  -> DeformableAggregation
  * Detr3DTemporalDecoderLayer (:192-480)        -> DecoderLayer
  * Detr3DTransformerDecoder (:126-190)          -> Decoder

The op order is self_attn -> norm -> cross_attn -> norm -> ffn -> norm, with
the temporal memory concatenated into the self-attention keys/values
(:377-396). The fused CUDA MultiScaleDeformableAttnFunction is replaced by
ops.msda (Pallas kernel with a pure-XLA oracle fallback).

Static geometry (feature level shapes, padded image size, pc range) is carried
as module attributes so layers remat cleanly.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import DecoderConfig, DeformableAggConfig
from ..geometry import denormalize_from_pc_range, project_to_image
from ..ops.msda import msda
from .layers import FFN


def _offset_bias_init(bias: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bias, bias)
    return init


class DeformableAggregation(nn.Module):
    """Multi-camera multi-scale deformable cross-attention
    (detr3d_transformer.py:483-569).

    Per query: `num_pts` key points = global ref point + learned offsets;
    weights = softmax over (cams x levels x points) per group, modulated by a
    camera embedding of lidar2img[:3,:4]; bilinear samples gathered from every
    camera/level pyramid and reduced over cameras."""
    cfg: DeformableAggConfig
    spatial_shapes: Tuple[Tuple[int, int], ...]
    pad_hw: Tuple[int, int]
    pc_range: Tuple[float, ...]

    @nn.compact
    def __call__(self,
                 instance_feature: jax.Array,   # (B, Q, C)
                 query_pos: jax.Array,          # (B, Q, C)
                 feat_flatten: jax.Array,       # (B*N, L_total, C)
                 reference_points: jax.Array,   # (B, Q, 3) in [0,1]
                 lidar2img: jax.Array,          # (B, N, 4, 4)
                 deterministic: bool = True) -> jax.Array:
        c = self.cfg
        b, q, ch = instance_feature.shape
        n = c.num_cams
        # key points: ref + learned offsets (:525); offset bias init U(-b, b)
        # with zero kernel (init_weight, :517-520)
        ref_global = denormalize_from_pc_range(reference_points, self.pc_range)
        offsets = nn.Dense(
            c.num_pts * 3,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=_offset_bias_init(c.offset_init_bias),
            dtype=instance_feature.dtype, name='learnable_fc')(instance_feature)
        key_points = ref_global[:, :, None, :] + offsets.reshape(b, q, c.num_pts, 3)

        # camera-modulated weights (:535-542): softmax over (cams*levels*pts)
        l2i_flat = lidar2img[..., :3, :].reshape(b, n, 12).astype(
            instance_feature.dtype)
        ce = nn.Dense(ch // 2, dtype=instance_feature.dtype, name='cam_embed0')(l2i_flat)
        ce = nn.relu(ce)
        ce = nn.Dense(ch, dtype=instance_feature.dtype, name='cam_embed1')(ce)
        ce = nn.relu(ce)
        ce = nn.LayerNorm(epsilon=1e-5,dtype=ce.dtype, name='cam_embed_ln')(ce)   # (B, N, C)
        feat_pos = (instance_feature + query_pos)[:, :, None, :] + ce[:, None, :, :]
        w = nn.Dense(c.num_groups * c.num_levels * c.num_pts,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=feat_pos.dtype, name='weights_fc')(feat_pos)
        # (B, Q, N, G*L*P) -> softmax over N*L*P jointly, per group (:540)
        w = w.reshape(b, q, n, c.num_levels * c.num_pts, c.num_groups)
        w = w.reshape(b, q, n * c.num_levels * c.num_pts, c.num_groups)
        w = jax.nn.softmax(w, axis=-2)
        w = w.reshape(b, q, n, c.num_levels, c.num_pts, c.num_groups)
        # -> (B*N, Q, G, L, P)
        w = w.transpose(0, 2, 1, 5, 3, 4).reshape(
            b * n, q, c.num_groups, c.num_levels, c.num_pts)

        # project key points into every camera (:547-552)
        uv, _ = project_to_image(key_points[:, None], lidar2img[:, :, None, None])
        pad_h, pad_w = self.pad_hw
        loc = uv / jnp.asarray([pad_w, pad_h], dtype=uv.dtype)
        loc = loc.reshape(b * n, q, c.num_pts, 2)

        # observability for tools/vis_attention.py: no-op unless apply() is
        # called with mutable=['intermediates'] (disable decoder remat then)
        self.sow('intermediates', 'sampling_loc', loc)
        self.sow('intermediates', 'attn_weights', w)

        feats = msda(feat_flatten, self.spatial_shapes, loc, w,
                     use_pallas=c.use_pallas)                 # (B*N, Q, C)
        feats = feats.reshape(b, n, q, ch).sum(axis=1)
        out = nn.Dense(ch, dtype=feats.dtype,
                       kernel_init=nn.initializers.xavier_uniform(),
                       name='output_proj')(feats)
        out = nn.Dropout(c.dropout, deterministic=deterministic)(out)
        return out + instance_feature


class SelfAttention(nn.Module):
    """MHA with additive positional embeddings; keys/values include the
    temporal memory (mmcv MultiheadAttention at detr3d_transformer.py:377-396).
    The reference's `dropout=0.1` applies to both attention probs and the
    residual path."""
    embed_dims: int
    num_heads: int
    dropout: float = 0.1
    attn_dropout: float = 0.1

    @nn.compact
    def __call__(self, query, query_pos, key, key_pos, attn_mask=None,
                 deterministic: bool = True):
        q = query + query_pos
        k = key + key_pos
        v = key
        mask = None
        if attn_mask is not None:
            # our attn_mask: True = blocked; flax mask: True = attend
            m = ~attn_mask
            mask = m[None, None] if m.ndim == 2 else m[:, None]
        import warnings
        with warnings.catch_warnings():
            # flax >= 0.7.4 warns whenever inputs_v is square (seq == feat),
            # a heuristic for "did you mean mask?" — our kwargs are correct
            warnings.filterwarnings('ignore', message='.*inputs_v.*',
                                    category=DeprecationWarning)
            out = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=self.embed_dims,
                out_features=self.embed_dims, dropout_rate=self.attn_dropout,
                dtype=query.dtype, name='mha')(q, inputs_k=k, inputs_v=v,
                                               mask=mask,
                                               deterministic=deterministic)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return query + out


class DecoderLayer(nn.Module):
    """self_attn -> norm -> cross_attn -> norm -> ffn -> norm
    (detr3d_transformer.py:311-422)."""
    cfg: DecoderConfig
    deform: DeformableAggConfig
    spatial_shapes: Tuple[Tuple[int, int], ...]
    pad_hw: Tuple[int, int]
    pc_range: Tuple[float, ...]

    @nn.compact
    def __call__(self, query, query_pos, feat_flatten, temp_memory, temp_pos,
                 reference_points, lidar2img, attn_mask,
                 deterministic: bool = True):
        c = self.cfg
        key = jnp.concatenate([query, temp_memory], axis=1)
        key_pos = jnp.concatenate([query_pos, temp_pos], axis=1)
        query = SelfAttention(c.embed_dims, c.num_heads, c.dropout,
                              c.attn_dropout, name='self_attn')(
            query, query_pos, key, key_pos, attn_mask, deterministic)
        query = nn.LayerNorm(epsilon=1e-5,dtype=query.dtype, name='norm0')(query)
        query = DeformableAggregation(
            self.deform, self.spatial_shapes, self.pad_hw, self.pc_range,
            name='cross_attn')(
            query, query_pos, feat_flatten, reference_points, lidar2img,
            deterministic)
        query = nn.LayerNorm(epsilon=1e-5,dtype=query.dtype, name='norm1')(query)
        query = FFN(c.embed_dims, c.ffn_dims, c.dropout, name='ffn')(
            query, deterministic)
        query = nn.LayerNorm(epsilon=1e-5,dtype=query.dtype, name='norm2')(query)
        return query


class Decoder(nn.Module):
    """Stack of `num_layers` decoder layers; returns all intermediates
    (detr3d_transformer.py:126-190). Optional per-layer rematerialization
    mirrors the reference's torch.utils.checkpoint (with_cp, :444-462)."""
    cfg: DecoderConfig
    deform: DeformableAggConfig
    spatial_shapes: Tuple[Tuple[int, int], ...]
    pad_hw: Tuple[int, int]
    pc_range: Tuple[float, ...]

    @nn.compact
    def __call__(self, query, query_pos, feat_flatten, temp_memory, temp_pos,
                 reference_points, lidar2img, attn_mask,
                 deterministic: bool = True):
        layer_cls = DecoderLayer
        if self.cfg.remat:
            # arg 0 is self; `deterministic` is arg 9
            layer_cls = nn.remat(DecoderLayer, static_argnums=(9,))
        intermediates = []
        for i in range(self.cfg.num_layers):
            query = layer_cls(self.cfg, self.deform, self.spatial_shapes,
                              self.pad_hw, self.pc_range, name=f'layer{i}')(
                query, query_pos, feat_flatten, temp_memory, temp_pos,
                reference_points, lidar2img, attn_mask, deterministic)
            intermediates.append(query)
        return jnp.stack(intermediates)   # (num_layers, B, Q, C)
