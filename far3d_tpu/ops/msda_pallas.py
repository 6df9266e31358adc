"""Fused Pallas TPU kernels for multi-scale deformable sampling.

Replaces the reference's MultiScaleDeformableAttnFunction CUDA op — forward
AND backward (detr3d_transformer.py:561-563, mmcv ms_deform_attn fwd/bwd) —
with a TPU-native design. Mosaic has no vectorized dynamic gather from VMEM,
so the bilinear gather is reformulated as a *tiled one-hot matmul* on the MXU,
and the per-(group, level, point) attention reduction is fused in-kernel:

    idx_c, bw_c = bilinear corners(loc, level)              (VPU, in-kernel)
    S[r, j]    = sum_corners bw_c[r] * (j == idx_c[r])      (VPU, per tile)
    sampled    = S @ value_level                            (MXU)
    out[q, :] += sum_p attw[q, g, p] * sampled[(q,p), g-slice]   (VPU)

Backward (two kernels, gradients in matmul form — no scatter anywhere):
    d_value   += S^T @ d_acc            where d_acc[r] = g[q(r)] * wfull[r]
    P          = d_acc @ value_chunk^T  (per tile)
    d_bw[r,c]  = sum_j onehot_c[r,j] * P[r,j]       (masked VPU reduce)
    d_wa       = (d_weighted * acc) @ expand^T      (acc recomputed in-kernel)
d_loc then follows from d_bw via the bilinear chain rule on tiny XLA tensors.

Design points (each validated by measurement on a v5e chip):
  * ONE pallas_call covers all FPN levels: rows are laid out level-major with
    points padded 13 -> 16 so a row-block is exactly 16 queries x 16 points;
    scalar-prefetched chunk tables route each block to its own level's
    feature columns (no cross-level MAC waste, one kernel launch);
  * corner indices/weights are computed IN-KERNEL from the normalized
    sampling locations and a scalar-prefetched (H, W) level table — the
    XLA-side wrapper never materializes the per-level row-space corner
    tensors (4 levels x (B, rows, 4) idx + bw, ~17 MB/layer of relayout
    traffic in the v1 design); the only per-level row tensor left is the
    attention weights;
  * the whole 4-level padded pyramid (~7.5 MB bf16 per camera) stays resident
    in VMEM for the call; the dV accumulator (f32) likewise, with calls split
    by a VMEM byte budget per dtype;
  * the attention-weighted point reduction happens in-kernel, so the
    (B, L, QP, C) sampled tensor never materializes (190 MB in early
    variants);
  * *queries* are validity-sorted once per camera (a 3D key point projects
    into ~2 of 7 cameras and a query's points share visibility); the valid
    count is scalar-prefetched and row-blocks past it skip all compute;
  * kernels accumulate f32, stage bf16 on the MXU.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda import _corner_data

P_PAD = 16                  # points per query, padded (reference uses 13)
Q_BLK = 16                  # queries per row-block
R_BLK = Q_BLK * P_PAD       # rows per block = 256
# 768 -> 512 with the in-kernel corner computation: the (R_BLK, L_BLK)
# iota/p_mat/sel temporaries plus the resident value block left only ~0.1 MB
# of scoped-VMEM headroom at training shapes (16.14M > 16M limit at 768);
# 512 restores margin, and L_BLK was measured perf-neutral 256..768 (the
# per-block chunk ranges already keep real spans narrow).
L_BLK = 512
# sentinel normalized coordinate for padded points/queries: far enough out
# that every bilinear corner is out of bounds at any level (weights -> 0)
_PAD_LOC = -4.0



def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _seg_t(dtype):
    """(R_BLK, Q_BLK) row->query assignment matrix (transposed segment sum)."""
    return (jax.lax.broadcasted_iota(jnp.int32, (R_BLK, Q_BLK), 0) // P_PAD ==
            jax.lax.broadcasted_iota(jnp.int32, (R_BLK, Q_BLK), 1)
            ).astype(dtype)


def _expand_mat(groups: int, c: int, dtype):
    """(groups, C) group->channel expansion matrix."""
    cg = c // groups
    ch_group = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 1) // cg
    return (ch_group == jax.lax.broadcasted_iota(
        jnp.int32, (groups, c), 0)).astype(dtype)


def _expand_mat_t(groups: int, c: int, dtype):
    """(C, groups) channel->group reduction matrix (transpose of the above,
    built directly so Mosaic never sees a transposed matmul operand)."""
    cg = c // groups
    ch_group = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    return (ch_group == jax.lax.broadcasted_iota(
        jnp.int32, (c, groups), 1)).astype(dtype)


def _kernel_corners(loc_ref, hw_ref, clo_ref, level, rows_as_lanes: bool):
    """Bilinear corner (call-local flat index, weight) arrays for this
    row-block, computed in-kernel from normalized (u, v) locations.

    Matches ops.msda._corner_data exactly: x = u*W - 0.5, indices clamped
    into the level, out-of-bounds corner weights zeroed (mask-multiply; the
    fractional parts dx/dy are in [0, 1) so the products never overflow).
    Sentinel-padded rows (loc = _PAD_LOC) zero all four weights.

    The four corners are CORNER-STACKED into single arrays — per-corner
    (R_BLK, 1) temporaries each occupy a full 128-lane VMEM tile (128 KB),
    and ~12 of them live across the chunk loop blew the 16 MB scope at
    inference shapes (measured: 16.37M with per-corner vectors, fits
    stacked). Corner order along the stacked axis: (y0,x0), (y0,x0+1),
    (y0+1,x0), (y0+1,x0+1) — i.e. x parity = c % 2, y parity = c // 2.

    rows_as_lanes=False -> (R_BLK, 4) idx/weight arrays (fwd/dattn);
    rows_as_lanes=True  -> (4, R_BLK) arrays (dval's transposed one-hot).
    """
    lxy = loc_ref[0]                                   # (R_BLK, 2) f32
    hf = hw_ref[level, 0].astype(jnp.float32)
    wf = hw_ref[level, 1].astype(jnp.float32)
    base = clo_ref[level] * L_BLK
    if rows_as_lanes:
        shape, caxis = (4, R_BLK), 0
        x = lxy[:, 0][None, :] * wf - 0.5              # (1, R_BLK)
        y = lxy[:, 1][None, :] * hf - 0.5
    else:
        shape, caxis = (R_BLK, 4), 1
        x = lxy[:, 0:1] * wf - 0.5                     # (R_BLK, 1)
        y = lxy[:, 1:2] * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    corner = jax.lax.broadcasted_iota(jnp.int32, shape, caxis)
    xodd = (corner % 2).astype(jnp.float32)            # x corner offset
    yodd = (corner // 2).astype(jnp.float32)           # y corner offset
    cx = x0 + xodd
    cy = y0 + yodd
    valid = ((cy >= 0) & (cy < hf) & (cx >= 0) & (cx < wf)
             ).astype(jnp.float32)
    idx = (jnp.clip(cy, 0.0, hf - 1.0) * wf
           + jnp.clip(cx, 0.0, wf - 1.0)).astype(jnp.int32) + base
    # w_x = (1-dx) for even corners, dx for odd; w_y analogous
    wgt = (xodd * dx + (1.0 - xodd) * (1.0 - dx)) * \
          (yodd * dy + (1.0 - yodd) * (1.0 - dy))
    return idx, wgt * valid


def _make_kernel(blocks_per_level: int, c: int, groups: int):
    def msda_fwd_kernel(nv_ref, clo_ref, rlo_ref, rhi_ref, hw_ref, loc_ref,
                        wa_ref, val_ref, out_ref):
        b = pl.program_id(0)
        r = pl.program_id(1)
        level = r // blocks_per_level
        qoff = r % blocks_per_level
        # NOTE: an extra `rlo < rhi` skip for empty-chunk-range blocks (their
        # output is exactly zero) measured NEUTRAL end to end — see
        # docs/PROFILE.md "empty-block epilogue skip" — so the gate stays
        # minimal. Do not retry without new geometry evidence.
        active = qoff * Q_BLK < nv_ref[b, level]

        @pl.when(active)
        def _():
            idx4, bw4 = _kernel_corners(loc_ref, hw_ref, clo_ref, level,
                                        rows_as_lanes=False)

            def body(li, acc):
                s = (clo_ref[level] + li) * L_BLK
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (R_BLK, L_BLK), 1) + s
                # f32 select-accumulate: 3 VPU ops/corner vs 4 for the
                # cast+multiply form — measured 7.4% faster fwd at inference
                # geometry (8.63 -> 7.99 ms, tools/dev_micro_msda_onehot.py,
                # docs/PROFILE.md "one-hot select"). The f32 staging buffer
                # is required: Mosaic's bf16 select on an i1 mask hits an
                # "invalid relayout" compiler bug.
                sel_f = jnp.zeros((R_BLK, L_BLK), jnp.float32)
                for ci in range(4):
                    sel_f = sel_f + jnp.where(
                        iota == idx4[:, ci][:, None],
                        bw4[:, ci][:, None], 0.0)
                sel = sel_f.astype(jnp.bfloat16)
                chunk = val_ref[0, pl.ds(s, L_BLK), :]
                return acc + jnp.dot(sel, chunk,
                                     preferred_element_type=jnp.float32)

            acc = jax.lax.fori_loop(
                rlo_ref[b, r], rhi_ref[b, r], body,
                jnp.zeros((R_BLK, c), jnp.float32))
            # fused attention-weighted point reduction, in matmul form
            # (Mosaic cannot reshape along the lane dim):
            #   wfull[r, ch] = wa[r, ch // cg]          (expand groups -> C)
            #   out[q, ch]   = sum_{r in query q} wa * acc   (segment sum)
            wa = wa_ref[0]                         # (R_BLK, groups) f32
            wfull = jnp.dot(wa, _expand_mat(groups, c, jnp.float32),
                            preferred_element_type=jnp.float32)
            weighted = acc * wfull                 # (R_BLK, C)
            row_q = jax.lax.broadcasted_iota(
                jnp.int32, (Q_BLK, R_BLK), 1) // P_PAD
            seg = (row_q == jax.lax.broadcasted_iota(
                jnp.int32, (Q_BLK, R_BLK), 0)).astype(jnp.bfloat16)
            out_ref[0] = jnp.dot(
                seg, weighted.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)

        @pl.when(jnp.logical_not(active))
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

    return msda_fwd_kernel


@functools.lru_cache(maxsize=None)
def _build_call(b: int, n_levels: int, q_pad: int, l_total_pad: int, c: int,
                groups: int):
    blocks_per_level = q_pad // Q_BLK
    n_r = n_levels * blocks_per_level
    rows_lp = q_pad * P_PAD
    # XLA stack-allocates the custom-call result in scoped VMEM when it fits;
    # at training query counts a bf16 result is 16-24M and overflows the 16M
    # scope, so emit f32 there (forced to HBM) and bf16 for inference shapes.
    out_bytes = b * n_levels * q_pad * c * 2
    out_dtype = jnp.bfloat16 if out_bytes <= 12 * 1024 * 1024 else jnp.float32
    return pl.pallas_call(
        _make_kernel(blocks_per_level, c, groups),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,   # nv, chunk_lo, rng_lo, rng_hi, hw
            grid=(b, n_r),
            in_specs=[
                # sorted sentinel-padded locations, shared by all levels
                pl.BlockSpec((1, R_BLK, 2),
                             lambda bb, r, *_: (bb, r % blocks_per_level, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R_BLK, groups),
                             lambda bb, r, *_: (bb, r, 0),
                             memory_space=pltpu.VMEM),
                # whole padded pyramid resident in VMEM per camera
                pl.BlockSpec((1, l_total_pad, c), lambda bb, r, *_: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Q_BLK, c), lambda bb, r, *_: (bb, r, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_levels * q_pad, c), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_levels * rows_lp * l_total_pad * c
            // max(n_levels, 1),
            bytes_accessed=b * (n_levels * rows_lp * groups * 4
                                + rows_lp * 8
                                + l_total_pad * c * 2 + n_levels * q_pad * c * 2),
            transcendentals=0),
    )


def _make_dval_kernel(blocks_per_level: int, c: int, groups: int):
    """d_value += S^T @ d_acc, accumulated over all row-blocks into the
    VMEM-resident (f32) gradient pyramid (mmcv ms_deform_attn_backward's
    value gradient, scatter-free)."""

    def msda_dval_kernel(nv_ref, clo_ref, rlo_ref, rhi_ref, hw_ref, loc_ref,
                         wa_ref, g_ref, dval_ref):
        b = pl.program_id(0)
        r = pl.program_id(1)
        level = r // blocks_per_level
        qoff = r % blocks_per_level

        @pl.when(r == 0)
        def _():
            dval_ref[0] = jnp.zeros_like(dval_ref[0])

        active = qoff * Q_BLK < nv_ref[b, level]

        @pl.when(active)
        def _():
            wa = wa_ref[0]                         # (R_BLK, groups) f32
            gq = g_ref[0]                          # (Q_BLK, C) f32
            # d_weighted[r] = g[q(r)]; wfull = group->channel expansion of wa
            d_weighted = jnp.dot(_seg_t(jnp.float32), gq,
                                 preferred_element_type=jnp.float32)
            wfull = jnp.dot(wa, _expand_mat(groups, c, jnp.float32),
                            preferred_element_type=jnp.float32)
            d_acc = (d_weighted * wfull).astype(jnp.bfloat16)   # (R_BLK, C)
            # corners in (4, R_BLK) orientation for the transposed one-hot
            idx4, bw4 = _kernel_corners(loc_ref, hw_ref, clo_ref, level,
                                        rows_as_lanes=True)
            bwh4 = bw4.astype(jnp.bfloat16)

            def body(li, _):
                s = (clo_ref[level] + li) * L_BLK
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (L_BLK, R_BLK), 0) + s
                sel_t = jnp.zeros((L_BLK, R_BLK), jnp.bfloat16)
                for ci in range(4):
                    onehot = (iota == idx4[ci][None, :]
                              ).astype(jnp.bfloat16)
                    sel_t = sel_t + onehot * bwh4[ci][None, :]
                dv = jnp.dot(sel_t, d_acc, preferred_element_type=jnp.float32)
                dval_ref[0, pl.ds(s, L_BLK), :] += dv
                return 0

            jax.lax.fori_loop(rlo_ref[b, r], rhi_ref[b, r], body, 0)

    return msda_dval_kernel


@functools.lru_cache(maxsize=None)
def _build_dval_call(b: int, n_levels: int, q_pad: int, l_total_pad: int,
                     c: int, groups: int):
    blocks_per_level = q_pad // Q_BLK
    n_r = n_levels * blocks_per_level
    return pl.pallas_call(
        _make_dval_kernel(blocks_per_level, c, groups),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(b, n_r),
            in_specs=[
                pl.BlockSpec((1, R_BLK, 2),
                             lambda bb, r, *_: (bb, r % blocks_per_level, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R_BLK, groups),
                             lambda bb, r, *_: (bb, r, 0),
                             memory_space=pltpu.VMEM),
                # cotangent rows for this row-block's queries
                pl.BlockSpec((1, Q_BLK, c),
                             lambda bb, r, *_: (bb, r, 0),
                             memory_space=pltpu.VMEM),
            ],
            # f32 gradient pyramid resident across the whole (b,·) sweep
            out_specs=pl.BlockSpec((1, l_total_pad, c),
                                   lambda bb, r, *_: (bb, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, l_total_pad, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_r * R_BLK * l_total_pad * c // max(n_levels, 1),
            bytes_accessed=b * (n_r * R_BLK * groups * 4
                                + n_levels * q_pad * c * 4
                                + l_total_pad * c * 4),
            transcendentals=0),
    )


def _make_dattn_kernel(blocks_per_level: int, c: int, groups: int):
    """d_wa (attention-weight grad) and d_bw (bilinear-corner-weight grad):
    recompute acc = S @ V in-kernel, and read per-corner sampled·d_acc dots
    out of P = d_acc @ V^T with the same one-hot masks."""

    def msda_dattn_kernel(nv_ref, clo_ref, rlo_ref, rhi_ref, hw_ref, loc_ref,
                          wa_ref, g_ref, val_ref, dwa_ref, dbw_ref):
        b = pl.program_id(0)
        r = pl.program_id(1)
        level = r // blocks_per_level
        qoff = r % blocks_per_level
        active = qoff * Q_BLK < nv_ref[b, level]

        @pl.when(active)
        def _():
            wa = wa_ref[0]
            gq = g_ref[0]
            expand = _expand_mat(groups, c, jnp.float32)
            d_weighted = jnp.dot(_seg_t(jnp.float32), gq,
                                 preferred_element_type=jnp.float32)
            wfull = jnp.dot(wa, expand, preferred_element_type=jnp.float32)
            d_acc = d_weighted * wfull
            d_acc_h = d_acc.astype(jnp.bfloat16)
            idx4, bw4 = _kernel_corners(loc_ref, hw_ref, clo_ref, level,
                                        rows_as_lanes=False)
            bwh4 = bw4.astype(jnp.bfloat16)

            def body(li, carry):
                acc, dbw = carry
                s = (clo_ref[level] + li) * L_BLK
                chunk = val_ref[0, pl.ds(s, L_BLK), :]     # (L_BLK, C) bf16
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (R_BLK, L_BLK), 1) + s
                # P[r, j] = d_acc[r] . value[j]  (contract channels)
                p_mat = jax.lax.dot_general(
                    d_acc_h, chunk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (R_BLK, L_BLK)
                sel = jnp.zeros((R_BLK, L_BLK), jnp.bfloat16)
                cols = []
                for ci in range(4):
                    onehot = (iota == idx4[:, ci][:, None])
                    sel = sel + (onehot.astype(jnp.bfloat16)
                                 * bwh4[:, ci][:, None])
                    cols.append(jnp.sum(onehot.astype(jnp.float32) * p_mat,
                                        axis=1, keepdims=True))
                acc = acc + jnp.dot(sel, chunk,
                                    preferred_element_type=jnp.float32)
                dbw = dbw + jnp.concatenate(cols, axis=1)
                return acc, dbw

            acc, dbw = jax.lax.fori_loop(
                rlo_ref[b, r], rhi_ref[b, r], body,
                (jnp.zeros((R_BLK, c), jnp.float32),
                 jnp.zeros((R_BLK, 4), jnp.float32)))
            # d_wa[r, g] = sum_{ch in g} d_weighted[r, ch] * acc[r, ch]
            dwa = jnp.dot(d_weighted * acc,
                          _expand_mat_t(groups, c, jnp.float32),
                          preferred_element_type=jnp.float32)  # (R_BLK, G)
            dwa_ref[0] = dwa
            dbw_ref[0] = dbw

        @pl.when(jnp.logical_not(active))
        def _():
            dwa_ref[0] = jnp.zeros_like(dwa_ref[0])
            dbw_ref[0] = jnp.zeros_like(dbw_ref[0])

    return msda_dattn_kernel


@functools.lru_cache(maxsize=None)
def _build_dattn_call(b: int, n_levels: int, q_pad: int, l_total_pad: int,
                      c: int, groups: int):
    blocks_per_level = q_pad // Q_BLK
    n_r = n_levels * blocks_per_level
    rows = n_levels * q_pad * P_PAD
    return pl.pallas_call(
        _make_dattn_kernel(blocks_per_level, c, groups),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(b, n_r),
            in_specs=[
                pl.BlockSpec((1, R_BLK, 2),
                             lambda bb, r, *_: (bb, r % blocks_per_level, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R_BLK, groups),
                             lambda bb, r, *_: (bb, r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Q_BLK, c),
                             lambda bb, r, *_: (bb, r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, l_total_pad, c), lambda bb, r, *_: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, R_BLK, groups),
                             lambda bb, r, *_: (bb, r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R_BLK, 4), lambda bb, r, *_: (bb, r, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, rows, groups), jnp.float32),
            jax.ShapeDtypeStruct((b, rows, 4), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_r * R_BLK * l_total_pad * c // max(n_levels, 1),
            bytes_accessed=b * (n_r * R_BLK * groups * 8
                                + n_levels * q_pad * c * 4
                                + l_total_pad * c * 2),
            transcendentals=0),
    )


def _pad_points(x: jax.Array, fill) -> jax.Array:
    """(B, Q, P, ...) -> (B, Q, P_PAD, ...)."""
    b, q, p = x.shape[:3]
    if p == P_PAD:
        return x
    pad = jnp.full((b, q, P_PAD - p) + x.shape[3:], fill, x.dtype)
    return jnp.concatenate([x, pad], axis=2)


class _Prep:
    """Shared forward/backward preprocessing: query validity sort, padded
    level layout, sentinel-padded location rows, per-level attention weights
    in sorted point-padded row space, and per-block chunk-range tables.

    Corner indices/weights are NOT materialized here — the kernels compute
    them from `loc_rows` + the scalar-prefetched (H, W) table (v1 built
    4-level row-space idx/bw tensors on the XLA side; measured ~1.2 ms/layer
    of relayout-bound index math at inference shapes)."""

    def __init__(self, spatial_shapes, loc, weights):
        b, q, p, _ = loc.shape
        _, _, g, n_lvl, _ = weights.shape
        self.b, self.q, self.p, self.g, self.n_lvl = b, q, p, g, n_lvl
        self.q_pad = _round_up(q, Q_BLK)
        self.rows_lp = self.q_pad * P_PAD
        self.spatial_shapes = spatial_shapes
        self.hw = jnp.asarray(spatial_shapes, jnp.int32)       # (n_lvl, 2)

        # padded level offsets inside the VMEM-resident pyramid (L_BLK aligned)
        self.l_pads = [_round_up(h * w, L_BLK) for (h, w) in spatial_shapes]
        offs_pad = [0]
        for lp in self.l_pads[:-1]:
            offs_pad.append(offs_pad[-1] + lp)
        self.offs_pad = offs_pad
        self.l_total_pad = offs_pad[-1] + self.l_pads[-1]

        # one query-validity sort per camera shared by all levels. A point
        # has an in-bounds bilinear corner at level (H, W) iff its normalized
        # coords lie in (-0.5/W, 1 + 0.5/W) x (-0.5/H, 1 + 0.5/H); the window
        # is widest at the coarsest level, so the union over levels reduces
        # to a box test.
        hmin = min(h for h, _ in spatial_shapes)
        wmin = min(w for _, w in spatial_shapes)
        x, y = loc[..., 0], loc[..., 1]
        pt_ok = ((x > -0.5 / wmin) & (x < 1 + 0.5 / wmin) &
                 (y > -0.5 / hmin) & (y < 1 + 0.5 / hmin))
        valid_q = jnp.any(pt_ok, axis=2)                        # (B, Q)
        # sort valid queries by their mean image row so a 16-query row-block
        # is spatially coherent — its per-block chunk range (below) then
        # covers a small slice of each level instead of the whole level.
        # Invalid queries sort to the back (+inf key).
        okf = pt_ok.astype(jnp.float32)
        mean_y = jnp.sum(jnp.clip(y, 0.0, 1.0) * okf, axis=2) / \
            jnp.maximum(jnp.sum(okf, axis=2), 1.0)
        key = jnp.where(valid_q, mean_y, jnp.inf)
        self.qorder = jnp.argsort(key, axis=1, stable=True)
        self.inv_qorder = jnp.argsort(self.qorder, axis=1)
        self.nv = jnp.broadcast_to(
            jnp.sum(valid_q, axis=1).astype(jnp.int32)[:, None], (b, n_lvl))

        # sort loc/weights once; everything downstream lives in sorted space
        self.loc_s = jnp.take_along_axis(
            loc, self.qorder[:, :, None, None], axis=1)
        w_sorted = jnp.take_along_axis(
            weights.astype(jnp.float32),
            self.qorder[:, :, None, None, None], axis=1)

        pad_q = self.q_pad - q
        # sentinel-padded sorted locations in row space (one tensor shared by
        # every level — the kernels recompute per-level corners from it)
        locp = _pad_points(self.loc_s.astype(jnp.float32), _PAD_LOC)
        if pad_q:
            locp = jnp.concatenate(
                [locp, jnp.full((b, pad_q, P_PAD, 2), _PAD_LOC, jnp.float32)],
                axis=1)
        self.loc_rows = locp.reshape(b, self.rows_lp, 2)

        wa_segs, rng_segs = [], []
        blocks = self.q_pad // Q_BLK
        for lvl, (h, w) in enumerate(spatial_shapes):
            wa = jnp.transpose(w_sorted[:, :, :, lvl], (0, 1, 3, 2))
            wa = _pad_points(wa, 0.0)
            if pad_q:
                wa = jnp.concatenate(
                    [wa, jnp.zeros((b, pad_q, P_PAD, g))], axis=1)
            wa_segs.append(wa.reshape(b, self.rows_lp, g))
            # per-row-block chunk range, level-local: a block only ever
            # touches chunks its (valid-corner) indices fall into, and the
            # mean-y sort above keeps that span narrow. Computed on the
            # small (B, Q, P, 4) corner tensors — never in row space.
            idx, bw = _corner_data(self.loc_s, h, w)
            chunk = idx.astype(jnp.int32) // L_BLK
            validc = bw > 0
            qmin = jnp.min(jnp.where(validc, chunk, 1 << 30), axis=(2, 3))
            qmax = jnp.max(jnp.where(validc, chunk, -1), axis=(2, 3))
            if pad_q:
                qmin = jnp.concatenate(
                    [qmin, jnp.full((b, pad_q), 1 << 30, qmin.dtype)], axis=1)
                qmax = jnp.concatenate(
                    [qmax, jnp.full((b, pad_q), -1, qmax.dtype)], axis=1)
            cmin = jnp.min(qmin.reshape(b, blocks, Q_BLK), axis=-1)
            hi = jnp.max(qmax.reshape(b, blocks, Q_BLK), axis=-1) + 1
            lo = jnp.minimum(cmin, hi)            # empty block -> (0, 0)
            rng_segs.append(jnp.stack([lo, hi], axis=-1).astype(jnp.int32))
        self.wa_segs = wa_segs
        self.rng_segs = rng_segs

    def pad_value(self, value, dtype=jnp.bfloat16):
        """Per-level zero-padded pyramid segments, L_BLK-aligned."""
        segs = []
        off = 0
        b = self.b
        c = value.shape[-1]
        for lvl, (h, w) in enumerate(self.spatial_shapes):
            v = value[:, off:off + h * w].astype(dtype)
            if self.l_pads[lvl] != h * w:
                v = jnp.concatenate(
                    [v, jnp.zeros((b, self.l_pads[lvl] - h * w, c), dtype)],
                    axis=1)
            segs.append(v)
            off += h * w
        return segs

    def level_groups(self, bytes_per_row: int, budget_bytes: int):
        """Partition levels into calls whose VMEM-resident pyramid (value or
        dV accumulator) stays under `budget_bytes`."""
        budget_rows = max(budget_bytes // bytes_per_row // L_BLK, 1) * L_BLK
        groups, cur, cur_rows = [], [], 0
        for lvl in range(self.n_lvl):
            if cur and cur_rows + self.l_pads[lvl] > budget_rows:
                groups.append(cur)
                cur, cur_rows = [], 0
            cur.append(lvl)
            cur_rows += self.l_pads[lvl]
        if cur:
            groups.append(cur)
        return groups

    def group_inputs(self, lvls):
        """Per-call row tensors (locations + attention weights) and the
        scalar routing tables (chunk offsets, per-block chunk ranges, level
        (H, W) table) for a group of levels.

        The row tensors are optimization-barriered: when the fwd and bwd of
        the custom_vjp live in one XLA program (training), XLA fuses the
        shared sort/corner-data producers across the custom-call boundary
        and silently corrupts the kernel inputs (same bug class as the
        output-side barrier below; reproduced on this image's TPU runtime —
        fwd-only exact, fwd+bwd program wrong without these)."""
        local_off, acc_off = [], 0
        for lvl in lvls:
            local_off.append(acc_off)
            acc_off += self.l_pads[lvl]
        wa_g = jnp.concatenate([self.wa_segs[lvl] for lvl in lvls], axis=1)
        loc_g, wa_g = jax.lax.optimization_barrier((self.loc_rows, wa_g))
        chunk_lo = jnp.asarray([o // L_BLK for o in local_off], jnp.int32)
        hw_g = jnp.asarray([self.spatial_shapes[lvl] for lvl in lvls],
                           jnp.int32)
        # per-(b, row-block) level-local chunk ranges (see __init__); two 2-D
        # arrays — a 3-D (B, n_r, 2) scalar-prefetch operand gets its trailing
        # dim padded to a full SMEM tile and blows the 1 MB SMEM budget
        rng_g = jnp.concatenate([self.rng_segs[lvl] for lvl in lvls], axis=1)
        rlo_g, rhi_g = rng_g[..., 0], rng_g[..., 1]
        nv_g = self.nv[:, :len(lvls)]
        return loc_g, wa_g, chunk_lo, (rlo_g, rhi_g), nv_g, hw_g, acc_off


# Measured on v5e: a single call holding the whole ~7.5 MB bf16 pyramid fits
# at inference query counts (q_pad ~1160, verified after the K=256 proposal
# budget) but overflows the 16 MB scoped VMEM at training counts
# (DN + proposals, q_pad ~1616) — so only large-Q calls split (one extra
# launch ~1 ms). The same overflow shows up at large batch (b=28, i.e. 4
# scene-lanes x 7 cams: scoped alloc 17.14M at compile time) even though the
# per-block shapes are b-invariant, so batched calls split too.
_FWD_SINGLE_CALL_MAX_Q = 1200
_FWD_SINGLE_CALL_MAX_B = 8
_FWD_BUDGET_SMALL_Q = 1 << 62        # no split
_FWD_BUDGET_LARGE_Q = 5_500_000      # bytes of bf16 pyramid per call
_DVAL_BUDGET = 10_500_000            # bytes of f32 dV accumulator per call
# Mosaic double-buffers the dV accumulator block even with a constant output
# index map (measured: 10.1 MB block -> 20.25 MB scoped alloc, compile OOM),
# so the per-call block must stay under half the 16 MB scope minus input
# overheads. Calls whose f32 block exceeds this split channel-wise along
# GROUP boundaries (the group->channel map is block-diagonal, so a channel
# slice aligned to groups is self-contained).
_DVAL_BLOCK_BUDGET = 5_500_000


def _fwd_budget(prep):
    if (prep.q_pad <= _FWD_SINGLE_CALL_MAX_Q
            and prep.b <= _FWD_SINGLE_CALL_MAX_B):
        return _FWD_BUDGET_SMALL_Q
    return _FWD_BUDGET_LARGE_Q


def _forward(value, spatial_shapes, loc, weights):
    prep = _Prep(spatial_shapes, loc, weights)
    b, q, c, g = prep.b, prep.q, value.shape[-1], prep.g
    val_segs = prep.pad_value(value)

    out_sorted = jnp.zeros((b, prep.q_pad, c), jnp.float32)
    for lvls in prep.level_groups(c * 2, _fwd_budget(prep)):
        loc_g, wa_g, chunk_lo, (rlo_g, rhi_g), nv_g, hw_g, acc_off = \
            prep.group_inputs(lvls)
        val_g = jnp.concatenate([val_segs[lvl] for lvl in lvls], axis=1)
        call = _build_call(b, len(lvls), prep.q_pad, acc_off, c, g)
        partial = call(nv_g, chunk_lo, rlo_g, rhi_g, hw_g, loc_g,
                       wa_g, val_g)
        # XLA silently miscompiles fusions across this custom-call boundary
        # (wrong numerics at full scale, exact with the barrier; reproduced
        # on this image's TPU runtime). Load-bearing — do not remove.
        partial = jax.lax.optimization_barrier(partial)
        out_sorted = out_sorted + jnp.sum(
            partial.reshape(b, len(lvls), prep.q_pad, c).astype(jnp.float32),
            axis=1)
    out_sorted = out_sorted[:, :q]
    out = jnp.take_along_axis(out_sorted, prep.inv_qorder[..., None], axis=1)
    return out.astype(value.dtype)


def _backward(value, spatial_shapes, loc, weights, g_out):
    """Pallas backward: d_value via S^T matmuls, d_loc/d_weights via the
    in-kernel recompute, bilinear chain rule on small XLA tensors
    (mmcv ms_deform_attn_backward semantics, detr3d_transformer.py:561-563)."""
    prep = _Prep(spatial_shapes, loc, weights)
    b, q, p, g, n_lvl = prep.b, prep.q, prep.p, prep.g, prep.n_lvl
    c = value.shape[-1]

    # cotangent rows in sorted, q-padded query space
    g_s = jnp.take_along_axis(g_out.astype(jnp.float32),
                              prep.qorder[..., None], axis=1)
    if prep.q_pad != q:
        g_s = jnp.concatenate(
            [g_s, jnp.zeros((b, prep.q_pad - q, c), jnp.float32)], axis=1)

    # ---- d_value: f32 accumulator pyramid, budget-split calls -------------
    dval_segs = {}
    for lvls in prep.level_groups(c * 4, _DVAL_BUDGET):
        loc_g, wa_g, chunk_lo, (rlo_g, rhi_g), nv_g, hw_g, acc_off = \
            prep.group_inputs(lvls)
        g_rep = jnp.concatenate([g_s] * len(lvls), axis=1)
        # channel-split along group boundaries when the f32 block won't fit
        n_split = 1
        block_bytes = acc_off * c * 4
        while (block_bytes // n_split > _DVAL_BLOCK_BUDGET
               and n_split < g and g % (n_split * 2) == 0):
            n_split *= 2
        c_s, g_sub = c // n_split, g // n_split
        parts = []
        for s in range(n_split):
            call = _build_dval_call(b, len(lvls), prep.q_pad, acc_off,
                                    c_s, g_sub)
            parts.append(call(
                nv_g, chunk_lo, rlo_g, rhi_g, hw_g, loc_g,
                wa_g[..., s * g_sub:(s + 1) * g_sub],
                g_rep[..., s * c_s:(s + 1) * c_s]))
        dval = (parts[0] if n_split == 1
                else jnp.concatenate(parts, axis=-1))
        dval = jax.lax.optimization_barrier(dval)
        off = 0
        for lvl in lvls:
            h, w = spatial_shapes[lvl]
            dval_segs[lvl] = dval[:, off:off + h * w]
            off += prep.l_pads[lvl]
    d_value = jnp.concatenate([dval_segs[lvl] for lvl in range(n_lvl)],
                              axis=1).astype(value.dtype)

    # ---- d_wa / d_bw: recompute kernel over the bf16 value pyramid --------
    val_segs = prep.pad_value(value)
    dwa_segs, dbw_segs = {}, {}
    for lvls in prep.level_groups(c * 2, _fwd_budget(prep)):
        loc_g, wa_g, chunk_lo, (rlo_g, rhi_g), nv_g, hw_g, acc_off = \
            prep.group_inputs(lvls)
        val_g = jnp.concatenate([val_segs[lvl] for lvl in lvls], axis=1)
        call = _build_dattn_call(b, len(lvls), prep.q_pad, acc_off, c, g)
        g_rep = jnp.concatenate([g_s] * len(lvls), axis=1)
        dwa, dbw = call(nv_g, chunk_lo, rlo_g, rhi_g, hw_g, loc_g, wa_g,
                        g_rep, val_g)
        dwa = jax.lax.optimization_barrier(dwa)
        dbw = jax.lax.optimization_barrier(dbw)
        for i, lvl in enumerate(lvls):
            dwa_segs[lvl] = dwa[:, i * prep.rows_lp:(i + 1) * prep.rows_lp]
            dbw_segs[lvl] = dbw[:, i * prep.rows_lp:(i + 1) * prep.rows_lp]

    # ---- assemble d_weights and d_loc in sorted query space ---------------
    d_weights_s = []
    d_loc_s = jnp.zeros((b, q, p, 2), jnp.float32)
    loc_s = prep.loc_s
    for lvl, (h, w) in enumerate(spatial_shapes):
        dwa_l = dwa_segs[lvl].reshape(b, prep.q_pad, P_PAD, g)[:, :q, :p]
        d_weights_s.append(jnp.transpose(dwa_l, (0, 1, 3, 2)))  # (B,Q,G,P)
        dbw_l = dbw_segs[lvl].reshape(b, prep.q_pad, P_PAD, 4)[:, :q, :p]
        # bilinear chain rule (matches _corner_data's corner order/masks)
        x = loc_s[..., 0] * w - 0.5
        y = loc_s[..., 1] * h - 0.5
        dx = x - jnp.floor(x)
        dy = y - jnp.floor(y)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        coeffs = (
            (y0, x0, -(1 - dy), -(1 - dx)),
            (y0, x0 + 1, (1 - dy), -dx),
            (y0 + 1, x0, -dy, (1 - dx)),
            (y0 + 1, x0 + 1, dy, dx),
        )
        ddx = jnp.zeros_like(dx)
        ddy = jnp.zeros_like(dy)
        for ci, (cy, cx, cdx, cdy) in enumerate(coeffs):
            valid = ((cy >= 0) & (cy < h) & (cx >= 0) & (cx < w)
                     ).astype(jnp.float32)
            db = dbw_l[..., ci] * valid
            ddx = ddx + db * cdx
            ddy = ddy + db * cdy
        d_loc_s = d_loc_s + jnp.stack([ddx * w, ddy * h], axis=-1)
    d_weights_s = jnp.stack(d_weights_s, axis=3)        # (B, Q, G, L, P)

    # unsort back to caller query order
    d_loc = jnp.take_along_axis(
        d_loc_s, prep.inv_qorder[:, :, None, None], axis=1)
    d_weights = jnp.take_along_axis(
        d_weights_s, prep.inv_qorder[:, :, None, None, None], axis=1)
    return (d_value, d_loc.astype(loc.dtype),
            d_weights.astype(weights.dtype))


def _clear_kernel_caches():
    """Drop memoized pallas_call builders (used by interpret-mode tests)."""
    _build_call.cache_clear()
    _build_dval_call.cache_clear()
    _build_dattn_call.cache_clear()


# ---------------------------------------------------------------------------
# SPMD partitioning: the op is independent along the leading B*N axis (every
# per-camera stream is self-contained), so under a sharded mesh (camera-
# sharded latency inference, parallel/cam_shard.py; data-parallel training)
# each device runs the kernels on its local batch slice instead of GSPMD
# gathering the operands around an opaque custom call. All non-batch factors
# are marked need-replication: a channel/group split would break the
# group->channel block-diagonal weighting, and the in-call query sort makes
# q-sharding pointless.
# ---------------------------------------------------------------------------

def _batch_axis(arg_shapes, mesh):
    """Leading-axis mesh axis (or None) from the first sharded operand."""
    from jax.sharding import NamedSharding
    for s in arg_shapes:
        sh = getattr(s, 'sharding', None)
        if isinstance(sh, NamedSharding) and len(sh.spec) and \
                sh.spec[0] is not None:
            return sh.spec[0], sh.mesh
    return None, mesh


@functools.lru_cache(maxsize=None)
def _partitioned_forward(spatial_shapes):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    # jit-wrap the impl: the kernels build constant scalar-prefetch tables
    # (chunk maps, (H, W) tables) during tracing, and custom_partitioning
    # requires a const-free jaxpr — the inner pjit keeps them internal
    fwd = custom_partitioning(
        jax.jit(lambda value, loc, weights: _forward(value, spatial_shapes,
                                                     loc, weights)))

    def infer(mesh, arg_shapes, result_shape):
        ax, mesh = _batch_axis(arg_shapes, mesh)
        return NamedSharding(mesh, PartitionSpec(ax))

    def partition(mesh, arg_shapes, result_shape):
        ax, mesh = _batch_axis(arg_shapes, mesh)
        b_only = NamedSharding(mesh, PartitionSpec(ax))

        def lower(value, loc, weights):
            return _forward(value, spatial_shapes, loc, weights)

        return mesh, lower, b_only, (b_only, b_only, b_only)

    fwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule='b t c, b q p i, b q g l p -> b q c',
        need_replication_factors=('t', 'c', 'q', 'p', 'i', 'g', 'l'))
    return fwd


@functools.lru_cache(maxsize=None)
def _partitioned_backward(spatial_shapes):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    bwd = custom_partitioning(
        jax.jit(lambda value, loc, weights, g_out: _backward(
            value, spatial_shapes, loc, weights, g_out)))

    def infer(mesh, arg_shapes, result_shape):
        ax, mesh = _batch_axis(arg_shapes, mesh)
        b_only = NamedSharding(mesh, PartitionSpec(ax))
        return (b_only, b_only, b_only)

    def partition(mesh, arg_shapes, result_shape):
        ax, mesh = _batch_axis(arg_shapes, mesh)
        b_only = NamedSharding(mesh, PartitionSpec(ax))

        def lower(value, loc, weights, g_out):
            return _backward(value, spatial_shapes, loc, weights, g_out)

        return mesh, lower, (b_only, b_only, b_only), (b_only,) * 4

    bwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=('b t c, b q p i, b q g l p, b q c '
                       '-> b t c, b q p i, b q g l p'),
        need_replication_factors=('t', 'c', 'q', 'p', 'i', 'g', 'l'))
    return bwd


def _single_device() -> bool:
    # The custom_partitioning wrapper exists purely for sharded meshes; its
    # call boundary blocks fusion of the sort/unsort wrapper ops with the
    # surrounding graph and measurably costs ~7% of a train step on one
    # chip (2.44 -> 2.27 it/s), so bypass it when no mesh can exist.
    return len(jax.devices()) == 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def msda_pallas(value: jax.Array,
                spatial_shapes: Sequence[Tuple[int, int]],
                loc: jax.Array,
                weights: jax.Array) -> jax.Array:
    """Fused deformable sampling (same contract as ops.msda.msda_xla)."""
    if _single_device():
        return _forward(value, tuple(spatial_shapes), loc, weights)
    return _partitioned_forward(tuple(spatial_shapes))(value, loc, weights)


def _fwd(value, spatial_shapes, loc, weights):
    if _single_device():
        out = _forward(value, tuple(spatial_shapes), loc, weights)
    else:
        out = _partitioned_forward(tuple(spatial_shapes))(value, loc, weights)
    return out, (value, loc, weights)


def _bwd(spatial_shapes, res, g):
    value, loc, weights = res
    if _single_device():
        return _backward(value, tuple(spatial_shapes), loc, weights, g)
    return _partitioned_backward(tuple(spatial_shapes))(
        value, loc, weights, g)


msda_pallas.defvjp(_fwd, _bwd)
