"""PETR/StreamPETR dense-attention stack (reference:
models/utils/petr_transformer.py + the PE frustum encoder in
models/utils/positional_encoding.py:82-200).

This is the legacy StreamPETR path that Far3D's shipped config registers but
does not use (SURVEY.md §2.1); provided for API parity and for running
StreamPETR-style dense-global-attention models on TPU. The reference's
flash-attn CUDA kernel (models/utils/attention.py) maps to explicit bf16
einsum attention with an f32 softmax (see FlashMHA below — the fused
`jax.nn.dot_product_attention` lowering is ~17x slower at these shapes);
bf16 on the MXU plays the role fp16 flash-attention plays on GPU.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import FFN


class FlashMHA(nn.Module):
    """Dense exact attention (reference FlashMHA, attention.py:94-137).

    Written as explicit einsum matmuls + f32 softmax, NOT
    `jax.nn.dot_product_attention`: on this TPU runtime the latter lowers
    ~17x slower at the PETR cross-attention shape (772 q x 6000 k, h=8,
    d=32) — 10.5 vs 0.60 ms measured, tools/dev_micro_attn_variants.py.
    bf16 matmuls on the MXU play the role fp16 flash-attention plays on
    GPU; the softmax accumulates in f32 as flash-attn does."""
    embed_dims: int = 256
    num_heads: int = 8

    @nn.compact
    def __call__(self, q, k, v, deterministic: bool = True, key_valid=None):
        h = self.num_heads
        d = self.embed_dims // h
        qp = nn.DenseGeneral((h, d), dtype=q.dtype, name='q_proj')(q)
        kp = nn.DenseGeneral((h, d), dtype=q.dtype, name='k_proj')(k)
        vp = nn.DenseGeneral((h, d), dtype=q.dtype, name='v_proj')(v)
        s = jnp.einsum('bqhd,bkhd->bhqk', qp, kp) * (d ** -0.5)
        if key_valid is not None:
            # (B, K) True = attend (the reference's key_padding_mask inverted)
            s = jnp.where(key_valid[:, None, None, :], s,
                          jnp.asarray(-1e9, s.dtype))
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum('bhqk,bkhd->bqhd', p, vp)
        return nn.DenseGeneral(self.embed_dims, axis=(-2, -1), dtype=q.dtype,
                               name='out_proj')(out)


class PETRTemporalDecoderLayer(nn.Module):
    """self_attn (queries + propagated memory) -> norm -> dense cross_attn
    over all image tokens -> norm -> ffn -> norm
    (petr_transformer.py:501-741)."""
    embed_dims: int = 256
    num_heads: int = 8
    ffn_dims: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, query_pos, feats, feats_pos, temp_memory,
                 temp_pos, attn_mask=None, deterministic: bool = True,
                 key_valid=None):
        # self attention with temporal memory as extra keys
        k = jnp.concatenate([query, temp_memory], axis=1) \
            if temp_memory is not None else query
        kp = jnp.concatenate([query_pos, temp_pos], axis=1) \
            if temp_memory is not None else query_pos
        mask = None
        if attn_mask is not None:
            m = ~attn_mask
            mask = m[None, None] if m.ndim == 2 else m[:, None]
        import warnings
        with warnings.catch_warnings():
            # flax >= 0.7.4 warns whenever inputs_v is square (seq == feat),
            # a heuristic for "did you mean mask?" — our kwargs are correct
            warnings.filterwarnings('ignore', message='.*inputs_v.*',
                                    category=DeprecationWarning)
            sa = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=self.embed_dims,
                dtype=query.dtype, name='self_attn')(
                query + query_pos, inputs_k=k + kp, inputs_v=k, mask=mask,
                deterministic=deterministic)
        query = nn.LayerNorm(epsilon=1e-5,dtype=query.dtype, name='norm0')(
            query + nn.Dropout(self.dropout, deterministic=deterministic)(sa))
        # dense global cross attention: K/V = all image tokens + 3D PE
        ca = FlashMHA(self.embed_dims, self.num_heads, name='cross_attn')(
            query + query_pos, feats + feats_pos, feats, deterministic,
            key_valid=key_valid)
        query = nn.LayerNorm(epsilon=1e-5,dtype=query.dtype, name='norm1')(
            query + nn.Dropout(self.dropout, deterministic=deterministic)(ca))
        query = FFN(self.embed_dims, self.ffn_dims, self.dropout, name='ffn')(
            query, deterministic)
        return nn.LayerNorm(epsilon=1e-5,dtype=query.dtype, name='norm2')(query)


class PETRTemporalTransformer(nn.Module):
    """Decoder stack returning all intermediates
    (petr_transformer.py:411-498)."""
    embed_dims: int = 256
    num_layers: int = 6
    num_heads: int = 8
    ffn_dims: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, query_pos, feats, feats_pos, temp_memory=None,
                 temp_pos=None, attn_mask=None, deterministic: bool = True):
        outs = []
        for i in range(self.num_layers):
            query = PETRTemporalDecoderLayer(
                self.embed_dims, self.num_heads, self.ffn_dims, self.dropout,
                name=f'layer{i}')(query, query_pos, feats, feats_pos,
                                  temp_memory, temp_pos, attn_mask,
                                  deterministic)
            outs.append(query)
        return jnp.stack(outs)


class PETREncoderLayer(nn.Module):
    """DETR encoder layer over image tokens: self_attn -> norm -> ffn -> norm
    (petr_transformer.py:331-357's TransformerLayerSequence members)."""
    embed_dims: int = 256
    num_heads: int = 8
    ffn_dims: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, pos, key_valid=None, deterministic: bool = True):
        sa = FlashMHA(self.embed_dims, self.num_heads, name='self_attn')(
            x + pos, x + pos, x, deterministic, key_valid=key_valid)
        x = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name='norm0')(
            x + nn.Dropout(self.dropout, deterministic=deterministic)(sa))
        x = FFN(self.embed_dims, self.ffn_dims, self.dropout, name='ffn')(
            x, deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name='norm1')(x)


class PETRTransformer(nn.Module):
    """Non-temporal DETR-style PETR transformer
    (petr_transformer.py:789-868 PETRTransformer + :361-409
    PETRTransformerDecoder, return_intermediate=True semantics):
    optional token encoder, zero-init targets, per-layer intermediates each
    passed through one shared post-norm LN. Registered-but-unused in the
    reference's shipped configs; provided for model-family parity.

    TPU-first interface: tokens are pre-flattened (B, T, C) with their
    positional embedding, `key_valid` (B, T) replaces the reference's
    inverted key_padding_mask, and batch stays the leading axis throughout
    (no (T, B, C) permutes)."""
    embed_dims: int = 256
    num_layers: int = 6
    num_encoder_layers: int = 0
    num_heads: int = 8
    ffn_dims: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, feats_pos, query_embed, key_valid=None,
                 deterministic: bool = True):
        """feats/feats_pos: (B, T, C); query_embed: (Q, C) learned.
        Returns (num_layers, B, Q, C) post-normed intermediates."""
        b = feats.shape[0]
        for i in range(self.num_encoder_layers):
            feats = PETREncoderLayer(
                self.embed_dims, self.num_heads, self.ffn_dims, self.dropout,
                name=f'enc{i}')(feats, feats_pos, key_valid, deterministic)
        query_pos = jnp.broadcast_to(query_embed[None],
                                     (b, *query_embed.shape))
        query = jnp.zeros_like(query_pos)
        post_norm = nn.LayerNorm(epsilon=1e-5, dtype=feats.dtype,
                                 name='post_norm')
        outs = []
        for i in range(self.num_layers):
            query = PETRTemporalDecoderLayer(
                self.embed_dims, self.num_heads, self.ffn_dims, self.dropout,
                name=f'layer{i}')(query, query_pos, feats, feats_pos,
                                  None, None, None, deterministic,
                                  key_valid=key_valid)
            outs.append(post_norm(query))
        return jnp.stack(outs)


class FlattenMHSelfAttention(nn.Module):
    """Per-token degenerate self-attention (petr_transformer.py:987-1041):
    the reference reshapes (T, B, C) -> (T*B, 1, C) so every token forms its
    own length-1 sequence and attends only to itself. Softmax over a single
    key is identically 1, so the q/k projections are mathematically inert
    (zero gradient) and the module reduces to
    ``identity + dropout(W_o @ W_v @ x)`` — implemented directly rather than
    through an attention primitive. Registered-but-unused in the reference's
    shipped configs; provided for model-family parity."""
    embed_dims: int = 256
    num_heads: int = 8          # inert: heads are re-concatenated untouched
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, pos=None, identity=None, deterministic: bool = True):
        if identity is None:
            identity = x
        # the reference adds pos into q/k only; v (and thus the output) never
        # sees it, so it is dropped here rather than computed and discarded
        del pos
        v = nn.Dense(self.embed_dims, dtype=x.dtype, name='v_proj')(x)
        out = nn.Dense(self.embed_dims, dtype=x.dtype, name='out_proj')(v)
        return identity + nn.Dropout(self.dropout,
                                     deterministic=deterministic)(out)


class FrustumPE(nn.Module):
    """3D frustum position embedding (PE, positional_encoding.py:82-200):
    per-pixel rays sampled at LID depths, transformed to ego space, normalized
    by the position range, MLP -> per-token embedding."""
    embed_dims: int = 256
    depth_num: int = 64
    depth_start: float = 1.0
    position_range: Tuple[float, ...] = (-152.4, -152.4, -5., 152.4, 152.4, 5.)

    @nn.compact
    def __call__(self, feat_hw: Tuple[int, int], pad_hw: Tuple[int, int],
                 img2lidar: jax.Array, dtype=jnp.float32) -> jax.Array:
        """img2lidar: (B, N, 4, 4). Returns (B*N, H*W, C) position embedding."""
        h, w = feat_hw
        pad_h, pad_w = pad_hw
        b, n = img2lidar.shape[:2]
        # pixel centers in padded-image coords
        us = (jnp.arange(w, dtype=jnp.float32) + 0.5) * (pad_w / w)
        vs = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (pad_h / h)
        u, v = jnp.meshgrid(us, vs, indexing='xy')
        # LID depth bins (positional_encoding.py LID=True)
        idx = jnp.arange(self.depth_num, dtype=jnp.float32)
        bin_size = 2 * (self.position_range[3] - self.depth_start) / (
            self.depth_num * (1 + self.depth_num))
        d = self.depth_start + bin_size * idx * (idx + 1) / 2      # (D,)
        uvd = jnp.stack([
            jnp.broadcast_to(u[..., None], (h, w, self.depth_num)) * d,
            jnp.broadcast_to(v[..., None], (h, w, self.depth_num)) * d,
            jnp.broadcast_to(d, (h, w, self.depth_num)),
            jnp.ones((h, w, self.depth_num))], axis=-1)            # (H,W,D,4)
        pts = jnp.einsum('bnij,hwdj->bnhwdi', img2lidar.astype(jnp.float32),
                         uvd)[..., :3]
        lo = jnp.asarray(self.position_range[:3])
        hi = jnp.asarray(self.position_range[3:6])
        pts = (pts - lo) / (hi - lo)
        pts = pts.reshape(b * n, h * w, self.depth_num * 3).astype(dtype)
        x = nn.Dense(self.embed_dims * 4, dtype=dtype, name='pe_fc1')(pts)
        x = nn.relu(x)
        return nn.Dense(self.embed_dims, dtype=dtype, name='pe_fc2')(x)


def sine_positional_encoding_2d(h: int, w: int, num_feats: int = 128,
                                temperature: float = 10000.0,
                                normalize: bool = True) -> jax.Array:
    """SinePositionalEncoding3D's per-image 2D part
    (positional_encoding.py:216-308) for dense PETR feature maps:
    (H, W, 2*num_feats)."""
    y = jnp.cumsum(jnp.ones((h, w)), axis=0)
    x = jnp.cumsum(jnp.ones((h, w)), axis=1)
    if normalize:
        eps, scale = 1e-6, 2 * jnp.pi
        y = y / (y[-1:, :] + eps) * scale
        x = x / (x[:, -1:] + eps) * scale
    dim_t = temperature ** (2 * (jnp.arange(num_feats) // 2) / num_feats)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])],
                   axis=-1).reshape(h, w, num_feats)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])],
                   axis=-1).reshape(h, w, num_feats)
    return jnp.concatenate([py, px], axis=-1)
