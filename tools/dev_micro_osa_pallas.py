"""Fused-OSA Pallas experiment (VERDICT r2 item 4): one kernel per
(camera, OSA block) computing the 5-conv chain + incremental concat-1x1 +
BN/ReLU epilogues on a VMEM-resident plane, vs the XLA chain.

Motivation (docs/PROFILE.md): stage4 = 20.4 ms of the 46.7 ms backbone; the
measured gap to the tile-padded roofline is per-conv HBM round trips plus
the 6-way concat materialization. This kernel keeps the whole 40x60 plane
(padded to rows = h*64 + w with 128-row halos) resident, computes each 3x3
conv as 9 shifted matmuls, accumulates the concat-1x1 output incrementally
per segment (so c_i ping-pong in two scratch buffers), and emits the
post-ReLU row-sums for the eSE gate (applied outside with the identity add;
the gate needs the full-plane mean so it cannot fuse).

Reference OSA semantics: vovnet.py:188-238. Run on the TPU:
  python tools/dev_micro_osa_pallas.py [--stage 4] [--iters 20]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 128
OFFS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def shapes_for_stage(stage):
    if stage == 4:
        # stage4 blocks 1..8: in 768, conv 192, out 768, plane 40x60
        return dict(h=40, w=60, wp=64, cin=768, cm=192, cout=768)
    if stage == 3:
        # stage3 blocks 1..2: in 512, conv 160, out 512, plane 80x120
        return dict(h=80, w=120, wp=128, cin=512, cm=160, cout=512)
    raise ValueError(stage)


def make_osa_kernel(h, wp, cin, cm, cout, r, rp):
    """One camera per grid step. Refs:
      x (rp, cin) bf16 halo-padded; mask (r, 1) bf16 interior mask;
      w1 (9*cin, cm); w2345 (4*9*cm, cm); wcat (cin+5*cm, cout);
      s5/b5 (5, cm) folded-BN scale/bias; sc/bc (1, cout);
      out y (rp, cout) bf16 (halo rows zeroed); tsum (1, cout) f32.
    Scratch: two (rp, cm) bf16 ping-pong planes + (r, cm) f32 acc.
    """

    n_chunk = max(cout // 256, 1)
    c_chunk = cout // n_chunk

    def kernel(x_ref, mask_ref, w1_ref, w2_ref, wcat_ref, s5_ref, b5_ref,
               sc_ref, bc_ref, y_ref, tsum_ref, c1_ref, c2_ref, c3_ref,
               c4_ref, c5_ref, acc_ref):
        mask = mask_ref[...]
        cs = [c1_ref, c2_ref, c3_ref, c4_ref, c5_ref]

        def conv(get_src, w_ref, w_base, c_in, stage_i, dst_ref):
            acc_ref[...] = jnp.zeros_like(acc_ref)
            for k, (dy, dx) in enumerate(OFFS):
                off = HALO + dy * wp + dx
                a = get_src(off)
                w = w_ref[w_base + k * c_in:w_base + (k + 1) * c_in, :]
                acc_ref[...] += jnp.dot(a, w,
                                        preferred_element_type=jnp.float32)
            t = acc_ref[...] * s5_ref[stage_i:stage_i + 1, :] \
                + b5_ref[stage_i:stage_i + 1, :]
            t = jnp.maximum(t, 0.0) * mask
            dst_ref[HALO:HALO + r, :] = t.astype(jnp.bfloat16)

        # zero halos (scratch is uninitialized / stale across grid steps)
        for cref in cs:
            cref[...] = jnp.zeros_like(cref)

        conv(lambda off: x_ref[0, off:off + r, :], w1_ref, 0, cin, 0, cs[0])
        for i in range(1, 5):
            conv(lambda off, s=cs[i - 1]: s[off:off + r, :], w2_ref,
                 (i - 1) * 9 * cm, cm, i, cs[i])

        # concat-1x1 + BN/ReLU epilogue, chunked over output channels so the
        # f32 accumulator stays a small stack temporary (a full-width
        # (r, cout) f32 accumulator blew the 16 MB scoped-vmem limit)
        y_ref[0, 0:HALO, :] = jnp.zeros((HALO, cout), jnp.bfloat16)
        y_ref[0, HALO + r:rp, :] = jnp.zeros((rp - HALO - r, cout),
                                             jnp.bfloat16)
        for ci in range(n_chunk):
            lo = ci * c_chunk
            acc = jnp.dot(x_ref[0, HALO:HALO + r, :],
                          wcat_ref[:cin, lo:lo + c_chunk],
                          preferred_element_type=jnp.float32)
            for i in range(5):
                seg = wcat_ref[cin + i * cm:cin + (i + 1) * cm,
                               lo:lo + c_chunk]
                acc += jnp.dot(cs[i][HALO:HALO + r, :], seg,
                               preferred_element_type=jnp.float32)
            t = acc * sc_ref[0:1, lo:lo + c_chunk] \
                + bc_ref[0:1, lo:lo + c_chunk]
            t = jnp.maximum(t, 0.0) * mask
            y_ref[0, HALO:HALO + r, lo:lo + c_chunk] = t.astype(jnp.bfloat16)
            tsum_ref[0, 0:1, lo:lo + c_chunk] = jnp.sum(t, axis=0,
                                                        keepdims=True)

    return kernel


@functools.lru_cache(maxsize=None)
def build_call(n_cams, h, wp, cin, cm, cout):
    r = h * wp
    rp = r + 2 * HALO
    kernel = make_osa_kernel(h, wp, cin, cm, cout, r, rp)
    return pl.pallas_call(
        kernel,
        grid=(n_cams,),
        in_specs=[
            pl.BlockSpec((1, rp, cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((r, 1), lambda i: (0, 0)),
            pl.BlockSpec((9 * cin, cm), lambda i: (0, 0)),
            pl.BlockSpec((4 * 9 * cm, cm), lambda i: (0, 0)),
            pl.BlockSpec((cin + 5 * cm, cout), lambda i: (0, 0)),
            pl.BlockSpec((5, cm), lambda i: (0, 0)),
            pl.BlockSpec((5, cm), lambda i: (0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, rp, cout), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_cams, rp, cout), jnp.bfloat16),
            jax.ShapeDtypeStruct((n_cams, 1, cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rp, cm), jnp.bfloat16),
            pltpu.VMEM((rp, cm), jnp.bfloat16),
            pltpu.VMEM((rp, cm), jnp.bfloat16),
            pltpu.VMEM((rp, cm), jnp.bfloat16),
            pltpu.VMEM((rp, cm), jnp.bfloat16),
            pltpu.VMEM((r, cm), jnp.float32),
        ],
        # plane-resident design: the conv chain's shifted-slice staging plus
        # the chunked f32 epilogue exceed the conservative 16 MB default
        # scope; v5e has 128 MB physical VMEM, so raise the scoped limit
        # instead of tiling the plane (which would cost halo recompute)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def pad_plane(x, wp):
    """(n, h, w, c) -> (n, h*wp + 2*HALO, c) halo-padded row layout."""
    n, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
    x = x.reshape(n, h * wp, c)
    return jnp.pad(x, ((0, 0), (HALO, HALO), (0, 0)))


def unpad_plane(y, h, w, wp):
    n = y.shape[0]
    return y[:, HALO:HALO + h * wp].reshape(n, h, wp, -1)[:, :, :w]


def fused_osa(x_pad, mask, weights, sh):
    """x_pad (n, rp, cin) bf16 -> (y_pad (n, rp, cout) bf16 pre-gate,
    tsum (n, 1, cout))."""
    call = build_call(x_pad.shape[0], sh['h'], sh['wp'], sh['cin'],
                      sh['cm'], sh['cout'])
    return call(x_pad, mask, weights['w1'], weights['w2345'],
                weights['wcat'], weights['s5'], weights['b5'],
                weights['sc'], weights['bc'])


def xla_osa(x, weights, sh):
    """Reference chain in plain XLA (NHWC, bf16) with the same folded-BN
    weights; returns the pre-gate activation t (n, h, w, cout)."""
    cm, cin = sh['cm'], sh['cin']
    feats = [x]
    cur = x
    for i in range(5):
        if i == 0:
            w = weights['w1'].reshape(3, 3, cin, cm)
        else:
            w = weights['w2345'][(i - 1) * 9 * cm:i * 9 * cm].reshape(
                3, 3, cm, cm)
        cur = jax.lax.conv_general_dilated(
            cur, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)
        cur = (cur * weights['s5'][i] + weights['b5'][i])
        cur = jnp.maximum(cur, 0.0).astype(jnp.bfloat16)
        feats.append(cur)
    cat = jnp.concatenate(feats, axis=-1)
    y = jnp.einsum('nhwc,cd->nhwd', cat, weights['wcat'],
                   preferred_element_type=jnp.float32)
    t = jnp.maximum(y * weights['sc'][0] + weights['bc'][0], 0.0)
    return t.astype(jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--stage', type=int, default=4)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--cams', type=int, default=7)
    ap.add_argument('--blocks', type=int, default=8)
    args = ap.parse_args()
    sh = shapes_for_stage(args.stage)
    h, w, wp, cin, cm, cout = (sh['h'], sh['w'], sh['wp'], sh['cin'],
                               sh['cm'], sh['cout'])
    r = h * wp
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.standard_normal((args.cams, h, w, cin)) * 0.5,
                    jnp.bfloat16)
    weights = {
        'w1': jnp.asarray(rng.standard_normal((9 * cin, cm)) / np.sqrt(
            9 * cin), jnp.bfloat16),
        'w2345': jnp.asarray(rng.standard_normal((4 * 9 * cm, cm)) / np.sqrt(
            9 * cm), jnp.bfloat16),
        'wcat': jnp.asarray(rng.standard_normal((cin + 5 * cm, cout))
                            / np.sqrt(cin + 5 * cm), jnp.bfloat16),
        's5': jnp.asarray(rng.uniform(0.8, 1.2, (5, cm)), jnp.float32),
        'b5': jnp.asarray(rng.standard_normal((5, cm)) * 0.1, jnp.float32),
        'sc': jnp.asarray(rng.uniform(0.8, 1.2, (1, cout)), jnp.float32),
        'bc': jnp.asarray(rng.standard_normal((1, cout)) * 0.1, jnp.float32),
    }
    col = np.zeros((r, 1), np.float32)
    col[:] = (np.arange(r) % wp < w)[:, None]
    mask = jnp.asarray(col, jnp.bfloat16)

    # numerics
    def run_fused(x, weights, mask):
        xp = pad_plane(x, wp).astype(jnp.bfloat16)
        y_pad, tsum = fused_osa(xp, mask, weights, sh)
        return unpad_plane(y_pad, h, w, wp), tsum

    f_fused = jax.jit(run_fused)
    f_xla = jax.jit(lambda x, weights: xla_osa(x, weights, sh))
    t0 = time.time()
    got, tsum = f_fused(x, weights, mask)
    got = np.asarray(got, np.float32)
    print(f'fused compiled+ran in {time.time()-t0:.1f}s')
    want = np.asarray(f_xla(x, weights), np.float32)
    scale = np.abs(want).max() + 1e-6
    err = np.abs(got - want).max() / scale
    mean_err = np.abs(got - want).mean() / scale
    tsum_want = want.reshape(args.cams, -1, cout).sum(axis=1)
    tsum_err = np.abs(np.asarray(tsum)[:, 0] - tsum_want).max() / (
        np.abs(tsum_want).max() + 1e-6)
    print(f'numerics: max rel {err:.3e}, mean rel {mean_err:.3e}, '
          f'tsum rel {tsum_err:.3e}')

    # timing: chain BLOCKS iterations inside one jit to amortize dispatch
    def time_fn(fn, *a):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            out = fn(*a)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.time() - t0)
        return min(ts)

    # timing: chain --blocks OSA blocks in ONE jit (cin == cout for the
    # non-first blocks, so y feeds the next block directly — also the
    # production composition; the kernel zeroes y's halo rows so no re-pad
    # is needed between blocks). Per-call dispatch through the tunnel is
    # ~25 ms on this 1-vCPU host, so single-op timing is meaningless.
    n_blocks = args.blocks
    xp = jax.device_put(pad_plane(x, wp).astype(jnp.bfloat16))

    @jax.jit
    def fused_chain(xp, weights, mask):
        s = 0.0
        for _ in range(n_blocks):
            xp, tsum = fused_osa(xp, mask, weights, sh)
            s = s + jnp.sum(tsum)
        return s

    @jax.jit
    def xla_chain(x, weights):
        s = 0.0
        for _ in range(n_blocks):
            x = xla_osa(x, weights, sh)
            s = s + jnp.sum(x.astype(jnp.float32)[:, 0, 0])
        return s

    tf = time_fn(fused_chain, xp, weights, mask)
    tx = time_fn(xla_chain, x, weights)
    flops = n_blocks * args.cams * (h * w) * 2 * (
        9 * cin * cm + 4 * 9 * cm * cm + (cin + 5 * cm) * cout)
    print(f'{n_blocks}-block chain | fused: {tf*1000:.2f} ms '
          f'({flops/tf/1e12:.1f} TF/s) | xla: {tx*1000:.2f} ms '
          f'({flops/tx/1e12:.1f} TF/s) | speedup {tx/tf:.2f}x')


if __name__ == '__main__':
    main()
