"""Fused Pallas TPU kernel for multi-scale deformable sampling.

Replaces the reference's MultiScaleDeformableAttnFunction CUDA op
(detr3d_transformer.py:561-563) with a TPU-native design. Mosaic has no
vectorized dynamic gather from VMEM, so the bilinear gather is reformulated as
a *tiled one-hot matmul* on the MXU, and the per-(group, level, point)
attention reduction is fused into the same kernel:

    S[r, j]    = sum_corners bw_c[r] * (j == idx_c[r])     (VPU, per tile)
    sampled    = S @ value_level                            (MXU)
    out[q, :] += sum_p attw[q, g, p] * sampled[(q,p), g-slice]   (VPU)

Design points (each validated by measurement on a v5e chip):
  * ONE pallas_call covers all FPN levels: rows are laid out level-major with
    points padded 13 -> 16 so a row-block is exactly 16 queries x 16 points;
    scalar-prefetched chunk tables route each block to its own level's
    feature columns (no cross-level MAC waste, one kernel launch);
  * the whole 4-level padded pyramid (~7.5 MB bf16 per camera) stays resident
    in VMEM for the call;
  * the attention-weighted point reduction happens in-kernel, so the kernel
    emits (B, L, Q, C) partial outputs directly — the (B, L, QP, C) sampled
    tensor (190 MB and a ~7 ms badly-shaped einsum in earlier variants) never
    materializes;
  * *queries* are validity-sorted once per camera (a 3D key point projects
    into ~2 of 7 cameras and a query's points share visibility); the valid
    count is scalar-prefetched and row-blocks past it skip all compute;
  * kernel accumulates f32, stores bf16.

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

from .msda import _corner_data, msda_onehot_xla, msda_xla

P_PAD = 16                  # points per query, padded (reference uses 13)
Q_BLK = 16                  # queries per row-block
R_BLK = Q_BLK * P_PAD       # rows per block = 256
L_BLK = 768


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(blocks_per_level: int, c: int, groups: int):
    cg = c // groups

    def kernel(nv_ref, clo_ref, cn_ref, idx_ref, bw_ref, wa_ref, val_ref,
               out_ref):
        b = pl.program_id(0)
        r = pl.program_id(1)
        level = r // blocks_per_level
        qoff = r % blocks_per_level
        active = qoff * Q_BLK < nv_ref[b, level]

        @pl.when(active)
        def _():
            idx = idx_ref[0]                       # (R_BLK, 4) int32, global
            bw = bw_ref[0]                         # (R_BLK, 4) f32
            lo = clo_ref[level]

            bwh = bw.astype(jnp.bfloat16)

            def body(li, acc):
                s = (lo + li) * L_BLK
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (R_BLK, L_BLK), 1) + s
                # built directly in bf16: saves the f32 staging buffer (VMEM
                # headroom at training shapes). mask.astype + multiply instead
                # of jnp.where — Mosaic's bf16 select on an i1 mask hits an
                # "invalid relayout" compiler bug.
                sel = jnp.zeros((R_BLK, L_BLK), jnp.bfloat16)
                for ci in range(4):
                    onehot = (iota == idx[:, ci][:, None]).astype(jnp.bfloat16)
                    sel = sel + onehot * bwh[:, ci][:, None]
                chunk = val_ref[0, pl.ds(s, L_BLK), :]
                return acc + jnp.dot(sel, chunk,
                                     preferred_element_type=jnp.float32)

            acc = jax.lax.fori_loop(
                0, cn_ref[level], body, jnp.zeros((R_BLK, c), jnp.float32))
            # fused attention-weighted point reduction, in matmul form
            # (Mosaic cannot reshape along the lane dim):
            #   wfull[r, ch] = wa[r, ch // cg]          (expand groups -> C)
            #   out[q, ch]   = sum_{r in query q} wa * acc   (segment sum)
            wa = wa_ref[0]                         # (R_BLK, groups) f32
            ch_group = jax.lax.broadcasted_iota(
                jnp.int32, (groups, c), 1) // cg
            expand = (ch_group == jax.lax.broadcasted_iota(
                jnp.int32, (groups, c), 0)).astype(jnp.float32)
            wfull = jnp.dot(wa, expand, preferred_element_type=jnp.float32)
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

    return kernel


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
            num_scalar_prefetch=3,   # nv (B, L), chunk_lo (L,), chunk_n (L,)
            grid=(b, n_r),
            in_specs=[
                pl.BlockSpec((1, R_BLK, 4), lambda bb, r, *_: (bb, r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R_BLK, 4), lambda bb, r, *_: (bb, r, 0),
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
            bytes_accessed=b * (n_levels * rows_lp * (8 + groups * 4)
                                + l_total_pad * c * 2 + n_levels * q_pad * c * 2),
            transcendentals=0),
    )


def _pad_points(x: jax.Array, fill) -> jax.Array:
    """(B, Q, P, ...) -> (B, Q, P_PAD, ...)."""
    b, q, p = x.shape[:3]
    if p == P_PAD:
        return x
    pad = jnp.full((b, q, P_PAD - p) + x.shape[3:], fill, x.dtype)
    return jnp.concatenate([x, pad], axis=2)


def _forward(value, spatial_shapes, loc, weights):
    b, q, p, _ = loc.shape
    _, _, g, n_lvl, _ = weights.shape
    c = value.shape[-1]
    q_pad = _round_up(q, Q_BLK)
    rows_lp = q_pad * P_PAD

    # padded level offsets inside the VMEM-resident pyramid (L_BLK aligned)
    l_pads = [_round_up(h * w, L_BLK) for (h, w) in spatial_shapes]
    offs_pad = [0]
    for lp in l_pads[:-1]:
        offs_pad.append(offs_pad[-1] + lp)
    l_total_pad = offs_pad[-1] + l_pads[-1]

    # one query-validity sort per camera shared by all levels. A point has an
    # in-bounds bilinear corner at level (H, W) iff its normalized coords lie
    # in (-0.5/W, 1 + 0.5/W) x (-0.5/H, 1 + 0.5/H); the window is widest at
    # the coarsest level, so the union over levels reduces to a box test.
    hmin = min(h for h, _ in spatial_shapes)
    wmin = min(w for _, w in spatial_shapes)
    x, y = loc[..., 0], loc[..., 1]
    pt_ok = ((x > -0.5 / wmin) & (x < 1 + 0.5 / wmin) &
             (y > -0.5 / hmin) & (y < 1 + 0.5 / hmin))
    valid_q = jnp.any(pt_ok, axis=2)                         # (B, Q)
    qorder = jnp.argsort(~valid_q, axis=1, stable=True)      # (B, Q)
    inv_qorder = jnp.argsort(qorder, axis=1)
    nv = jnp.broadcast_to(jnp.sum(valid_q, axis=1).astype(jnp.int32)[:, None],
                          (b, n_lvl))

    # sort loc/weights once; corner data is computed in sorted space so the
    # per-level index/weight tensors need no further gathers
    loc_s = jnp.take_along_axis(loc, qorder[:, :, None, None], axis=1)
    w_sorted = jnp.take_along_axis(
        weights.astype(jnp.float32), qorder[:, :, None, None, None], axis=1)

    pad_q = q_pad - q
    idx_segs, bw_segs, wa_segs = [], [], []
    for lvl, (h, w) in enumerate(spatial_shapes):
        idx, bw = _corner_data(loc_s, h, w)     # (B, Q, P, 4), level-local
        idx = idx.astype(jnp.int32) + offs_pad[lvl]
        bw = bw.astype(jnp.float32)
        idx = _pad_points(idx, -1)
        bw = _pad_points(bw, 0.0)
        wa = jnp.transpose(w_sorted[:, :, :, lvl], (0, 1, 3, 2))  # (B,Q,P,G)
        wa = _pad_points(wa, 0.0)
        if pad_q:
            idx = jnp.concatenate(
                [idx, jnp.full((b, pad_q, P_PAD, 4), -1, jnp.int32)], axis=1)
            bw = jnp.concatenate(
                [bw, jnp.zeros((b, pad_q, P_PAD, 4))], axis=1)
            wa = jnp.concatenate(
                [wa, jnp.zeros((b, pad_q, P_PAD, g))], axis=1)
        idx_segs.append(idx.reshape(b, rows_lp, 4))
        bw_segs.append(bw.reshape(b, rows_lp, 4))
        wa_segs.append(wa.reshape(b, rows_lp, g))
    idx_segs_list, bw_segs_list, wa_segs_list = idx_segs, bw_segs, wa_segs

    # padded pyramid values
    val_segs = []
    off = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, off:off + h * w].astype(jnp.bfloat16)
        if l_pads[lvl] != h * w:
            v = jnp.concatenate(
                [v, jnp.zeros((b, l_pads[lvl] - h * w, c), jnp.bfloat16)],
                axis=1)
        val_segs.append(v)
        off += h * w
    val_all = jnp.concatenate(val_segs, axis=1)

    # Partition levels into calls whose VMEM-resident (double-buffered)
    # pyramid stays under the 16M scoped limit. Measured on v5e: a single
    # call holding the whole ~7.5 MB pyramid fits at inference query counts
    # (q_pad ~1040) but overflows by ~1M at training counts (DN + proposals,
    # q_pad ~1616) — so only large-Q calls split (one extra launch ~1 ms).
    if q_pad <= 1100:
        budget_rows = sum(l_pads)
    else:
        budget_rows = (5_500_000 // (c * 2)) // L_BLK * L_BLK
    groups_of_levels = []
    cur, cur_rows = [], 0
    for lvl in range(n_lvl):
        if cur and cur_rows + l_pads[lvl] > budget_rows:
            groups_of_levels.append(cur)
            cur, cur_rows = [], 0
        cur.append(lvl)
        cur_rows += l_pads[lvl]
    if cur:
        groups_of_levels.append(cur)

    out_sorted = jnp.zeros((b, q_pad, c), jnp.float32)
    for lvls in groups_of_levels:
        # per-call padded offsets local to this call's value buffer
        local_off, acc_off = [], 0
        for lvl in lvls:
            local_off.append(acc_off)
            acc_off += l_pads[lvl]
        idx_g = jnp.concatenate(
            [idx_segs_list[lvl] - offs_pad[lvl] + local_off[i]
             for i, lvl in enumerate(lvls)], axis=1)
        bw_g = jnp.concatenate([bw_segs_list[lvl] for lvl in lvls], axis=1)
        wa_g = jnp.concatenate([wa_segs_list[lvl] for lvl in lvls], axis=1)
        val_g = jnp.concatenate([val_segs[lvl] for lvl in lvls], axis=1)
        chunk_lo = jnp.asarray([o // L_BLK for o in local_off], jnp.int32)
        chunk_n = jnp.asarray([l_pads[lvl] // L_BLK for lvl in lvls],
                              jnp.int32)
        nv_g = nv[:, :len(lvls)]
        call = _build_call(b, len(lvls), q_pad, acc_off, c, g)
        partial = call(nv_g, chunk_lo, chunk_n, idx_g, bw_g, wa_g, val_g)
        # XLA silently miscompiles fusions across this custom-call boundary
        # (wrong numerics at full scale, exact with the barrier; reproduced
        # on this image's TPU runtime). Load-bearing — do not remove.
        partial = jax.lax.optimization_barrier(partial)
        out_sorted = out_sorted + jnp.sum(
            partial.reshape(b, len(lvls), q_pad, c).astype(jnp.float32),
            axis=1)
    out_sorted = out_sorted[:, :q]
    out = jnp.take_along_axis(out_sorted, inv_qorder[..., None], axis=1)
    return out.astype(value.dtype)


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
    # gradient path: the chunked one-hot matmul formulation — its vjp is
    # matmul transposes on the MXU instead of XLA's serial scatter-add
    value, loc, weights = res
    _, vjp = jax.vjp(
        lambda v, l, w: msda_onehot_xla(v, tuple(spatial_shapes), l, w),
        value, loc, weights)
    return vjp(g)


msda_pallas.defvjp(_fwd, _bwd)
