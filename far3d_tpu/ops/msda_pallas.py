"""Fused Pallas TPU kernel for multi-scale deformable sampling.

Replaces the reference's MultiScaleDeformableAttnFunction CUDA op
(detr3d_transformer.py:561-563) with a TPU-native design. Mosaic has no
vectorized dynamic gather from VMEM, so the bilinear gather is reformulated as
a *tiled one-hot matmul* on the MXU:

    S[r, j] = sum_corners bw_c[r] * (j == idx_c[r])   (VPU, built per tile)
    sampled[r, :] = S @ value_level                    (MXU)

Design points:
  * one pallas_call per FPN level; rows enumerate (query, point) samples so a
    row only pays MACs against its own level's columns;
  * the whole level's features live in VMEM for the entire call (block index
    depends only on the camera), so HBM reads the pyramid once per call
    instead of once per row-block;
  * rows are pre-sorted so that valid (in-view) samples come first, and the
    per-camera valid count is a scalar-prefetch arg: row-blocks past the
    count skip all compute (a 3D key point projects into only ~2 of 7
    cameras, so this skips most of the MXU work);
  * the per-(group, level, point) attention-weight reduction stays in XLA.

Wrapped in jax.custom_vjp with the backward pass delegated to the
differentiable XLA formulation (ops/msda.py): the kernel is the inference
hot path, training gradients reuse the oracle.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda import _corner_data, msda_xla

R_BLK = 256
L_BLK = 768


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(n_l: int):
    def kernel(n_valid_ref, idx_ref, bw_ref, val_ref, out_ref):
        b = pl.program_id(0)
        r = pl.program_id(1)
        active = r * R_BLK < n_valid_ref[b]

        @pl.when(active)
        def _():
            idx = idx_ref[0]                       # (R_BLK, 4) int32
            bw = bw_ref[0]                         # (R_BLK, 4) f32

            def body(li, acc):
                s = li * L_BLK
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (R_BLK, L_BLK), 1) + s
                sel = jnp.zeros((R_BLK, L_BLK), jnp.float32)
                for c in range(4):
                    sel = sel + jnp.where(iota == idx[:, c][:, None],
                                          bw[:, c][:, None], 0.0)
                chunk = val_ref[0, pl.ds(s, L_BLK), :]
                return acc + jnp.dot(sel.astype(jnp.bfloat16), chunk,
                                     preferred_element_type=jnp.float32)

            acc = jax.lax.fori_loop(
                0, n_l, body, jnp.zeros((R_BLK, val_ref.shape[-1]),
                                        jnp.float32))
            out_ref[0] = acc

        @pl.when(jnp.logical_not(active))
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

    return kernel


@functools.lru_cache(maxsize=None)
def _build_level_call(b: int, rows_pad: int, l_pad: int, c: int):
    n_r = rows_pad // R_BLK
    n_l = l_pad // L_BLK
    return pl.pallas_call(
        _make_kernel(n_l),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_r),
            in_specs=[
                pl.BlockSpec((1, R_BLK, 4), lambda bb, r, *_: (bb, r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R_BLK, 4), lambda bb, r, *_: (bb, r, 0),
                             memory_space=pltpu.VMEM),
                # whole level resident in VMEM, re-fetched only per camera
                pl.BlockSpec((1, l_pad, c), lambda bb, r, *_: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R_BLK, c), lambda bb, r, *_: (bb, r, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows_pad, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * rows_pad * l_pad * c,
            bytes_accessed=b * (rows_pad * 8 + l_pad * c * 2
                                + rows_pad * c * 4),
            transcendentals=0),
    )


def _sample_level(value_lvl: jax.Array, loc: jax.Array, h: int, w: int
                  ) -> jax.Array:
    """Gather bilinear samples for one level.

    value_lvl: (B, H*W, C); loc: (B, Q, P, 2). Returns (B, Q, P, C) f32."""
    b, q, p, _ = loc.shape
    c = value_lvl.shape[-1]
    idx, bw = _corner_data(loc, h, w)           # (B, Q, P, 4)
    rows = q * p
    rows_pad = _round_up(rows, R_BLK)
    l_pad = _round_up(h * w, L_BLK)
    idx = idx.reshape(b, rows, 4).astype(jnp.int32)
    bw = bw.reshape(b, rows, 4).astype(jnp.float32)

    # sort valid (in-view) samples first so trailing row-blocks can be skipped
    valid = jnp.any(bw > 0, axis=-1)            # (B, rows)
    order = jnp.argsort(~valid, axis=1, stable=True)
    inv_order = jnp.argsort(order, axis=1)
    n_valid = jnp.sum(valid, axis=1).astype(jnp.int32)
    idx = jnp.take_along_axis(idx, order[..., None], axis=1)
    bw = jnp.take_along_axis(bw, order[..., None], axis=1)

    pad_r = rows_pad - rows
    if pad_r:
        idx = jnp.concatenate(
            [idx, jnp.full((b, pad_r, 4), -1, jnp.int32)], axis=1)
        bw = jnp.concatenate([bw, jnp.zeros((b, pad_r, 4))], axis=1)
    val = value_lvl.astype(jnp.bfloat16)
    if l_pad != h * w:
        val = jnp.concatenate(
            [val, jnp.zeros((b, l_pad - h * w, c), jnp.bfloat16)], axis=1)
    call = _build_level_call(b, rows_pad, l_pad, c)
    out = call(n_valid, idx, bw, val)
    out = jnp.take_along_axis(out[:, :rows], inv_order[..., None], axis=1)
    out = out * valid[..., None]
    out = out.reshape(b, q, p, c)
    # XLA silently miscompiles the fusion of this unsort/reshape chain with
    # the downstream per-group einsum (wrong numerics at full scale, exact
    # with the barrier; reproduced on the TPU runtime of this image). Pinning
    # the sampled features here is load-bearing — do not remove.
    return jax.lax.optimization_barrier(out)


def _forward(value, spatial_shapes, loc, weights):
    b, q, p, _ = loc.shape
    _, _, g, n_lvl, _ = weights.shape
    c = value.shape[-1]
    cg = c // g
    out = jnp.zeros((b, q, g, cg), jnp.float32)
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        sampled = _sample_level(value[:, offset:offset + h * w], loc, h, w)
        sampled = sampled.reshape(b, q, p, g, cg)
        out = out + jnp.einsum(
            'bqpgc,bqgp->bqgc', sampled,
            weights[:, :, :, lvl].astype(jnp.float32),
            preferred_element_type=jnp.float32)
        offset += h * w
    return out.reshape(b, q, c).astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def msda_pallas(value: jax.Array,
                spatial_shapes: Sequence[Tuple[int, int]],
                loc: jax.Array,
                weights: jax.Array) -> jax.Array:
    """Fused deformable sampling (same contract as ops.msda.msda_xla)."""
    return _forward(value, tuple(spatial_shapes), loc, weights)


def _fwd(value, spatial_shapes, loc, weights):
    return _forward(value, tuple(spatial_shapes), loc, weights), (
        value, loc, weights)


def _bwd(spatial_shapes, res, g):
    value, loc, weights = res
    _, vjp = jax.vjp(lambda v, l, w: msda_xla(v, tuple(spatial_shapes), l, w),
                     value, loc, weights)
    return vjp(g)


msda_pallas.defvjp(_fwd, _bwd)
