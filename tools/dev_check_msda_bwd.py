"""Dev check: MSDA Pallas backward on real TPU — correctness vs the one-hot
XLA oracle at small scale, then wall-clock at training scale.

Usage: python tools/dev_check_msda_bwd.py [--small-only]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from far3d_tpu.ops.msda import msda_onehot_xla, msda_xla
from far3d_tpu.ops.msda_pallas import msda_pallas


def rand_inputs(rng, b, q, p, g, c, shapes, clustered=False):
    lt = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.standard_normal((b, lt, c)), jnp.bfloat16)
    if clustered:
        # realistic: a query's points cluster around its projected center
        # (ref point + learned offsets of a few meters), not i.i.d. uniform
        centers = rng.uniform(-0.1, 1.1, (b, q, 1, 2))
        loc = centers + rng.normal(0, 0.02, (b, q, p, 2))
    else:
        loc = rng.uniform(-0.2, 1.2, (b, q, p, 2))
    loc = jnp.asarray(loc, jnp.float32)
    weights = jnp.asarray(rng.random((b, q, g, len(shapes), p)), jnp.float32)
    return value, loc, weights


def check_small():
    # NB: inputs are passed as explicit jit arguments. Closure-captured
    # (constant-folded) inputs deterministically corrupt pallas custom-call
    # programs on this axon runtime — see CLAUDE.md.
    rng = np.random.default_rng(0)
    shapes = ((12, 16), (6, 8))
    value, loc, weights = rand_inputs(rng, 2, 64, 13, 8, 256, shapes)
    ct = jnp.asarray(rng.standard_normal((2, 64, 256)), jnp.float32)

    def run(fn, v, l, w, g):
        out, vjp = jax.vjp(lambda vv, ll, ww: fn(vv, shapes, ll, ww), v, l, w)
        return (out,) + tuple(vjp(g.astype(out.dtype)))

    t0 = time.time()
    got = jax.jit(lambda v, l, w, g: run(msda_pallas, v, l, w, g))(
        value, loc, weights, ct)
    got = [np.asarray(x, np.float32) for x in got]
    print(f'pallas fwd+bwd compiled+ran in {time.time()-t0:.1f}s')
    want = jax.jit(lambda v, l, w, g: run(
        lambda vv, s, ll, ww: msda_xla(vv.astype(jnp.float32), s, ll, ww),
        v, l, w, g))(value, loc, weights, ct)
    want = [np.asarray(x, np.float32) for x in want]
    names = ['out', 'd_value', 'd_loc', 'd_weights']
    ok = True
    for n, a, b in zip(names, got, want):
        scale = np.abs(b).max() + 1e-6
        err = np.abs(a - b).max() / scale
        print(f'  {n}: max|diff|/scale = {err:.2e} (scale {scale:.2f})')
        ok &= err < 2e-2
    print('SMALL CHECK', 'PASS' if ok else 'FAIL')
    return ok


def bench_train_scale():
    rng = np.random.default_rng(1)
    shapes = ((80, 120), (40, 60), (20, 30), (10, 15))
    b, q, p, g, c = 7, 1612, 13, 8, 256
    value, loc, weights = rand_inputs(rng, b, q, p, g, c, shapes,
                                      clustered=True)
    ct = jnp.asarray(rng.standard_normal((b, q, c)), jnp.float32)

    # forward-only timing first
    fwd = jax.jit(lambda v, l, w: jnp.sum(
        msda_pallas(v, shapes, l, w).astype(jnp.float32) ** 2))
    float(np.asarray(fwd(value, loc, weights)))
    times = []
    for _ in range(5):
        t0 = time.time()
        float(np.asarray(fwd(value, loc, weights)))
        times.append(time.time() - t0)
    print(f'pallas fwd-only per call: {min(times)*1000:.1f} ms')

    def grads(fn):
        def f(v, l, w, g):
            out, vjp = jax.vjp(lambda vv, ll, ww: fn(vv, shapes, ll, ww),
                               v, l, w)
            gv, gl, gw = vjp(g.astype(out.dtype))
            # reduce to scalars so the host fetch forces full execution
            return (jnp.sum(out.astype(jnp.float32) ** 2),
                    jnp.sum(gv.astype(jnp.float32) ** 2),
                    jnp.sum(gl ** 2), jnp.sum(gw ** 2))
        return jax.jit(f)

    for name, fn in [('pallas', msda_pallas),
                     ('onehot-xla', msda_onehot_xla)]:
        f = grads(fn)
        t0 = time.time()
        r = f(value, loc, weights, ct)
        r = [np.asarray(x) for x in r]
        print(f'{name}: first call (compile+run) {time.time()-t0:.1f}s; '
              f'sums {[float(x) for x in r]}')
        times = []
        for _ in range(5):
            t0 = time.time()
            r = f(value, loc, weights, ct)
            np.asarray(r[0])
            np.asarray(r[1]); np.asarray(r[2]); np.asarray(r[3])
            times.append(time.time() - t0)
        print(f'{name}: fwd+bwd per call: {min(times)*1000:.1f} ms '
              f'(median {sorted(times)[len(times)//2]*1000:.1f})')


def check_vmem_splits():
    """On-hardware coverage of the scoped-VMEM budget-split paths.

    b=28 (4 scene-lanes x 7 cams) x q=1612 hits, in one fwd+bwd program,
    BOTH split routes that overflowed scoped VMEM on real hardware in round
    2: the level-split forward/recompute (b > _FWD_SINGLE_CALL_MAX_B and
    large q_pad) and the group-aligned channel-split of the f32 dV
    accumulator. Until now these were only interpret-tested on CPU
    (tests/test_msda.py); this catches the next VMEM regression at compile
    time, before a training run does. Correctness vs the XLA gather oracle
    at a b=4 slice (full-scale oracle is wasteful on one chip).
    """
    from far3d_tpu.ops import msda_pallas as mp
    rng = np.random.default_rng(2)
    shapes = ((80, 120), (40, 60), (20, 30), (10, 15))
    b, q, p, g, c = 28, 1612, 13, 8, 256
    value, loc, weights = rand_inputs(rng, b, q, p, g, c, shapes,
                                      clustered=True)
    ct = jnp.asarray(rng.standard_normal((b, q, c)), jnp.float32)
    assert b > mp._FWD_SINGLE_CALL_MAX_B and q > mp._FWD_SINGLE_CALL_MAX_Q, \
        'shape no longer exercises the split paths — update this check'

    def f(v, l, w, gg):
        out, vjp = jax.vjp(lambda vv, ll, ww: msda_pallas(vv, shapes, ll, ww),
                           v, l, w)
        gv, gl, gw = vjp(gg.astype(out.dtype))
        return out, gv, gl, gw

    t0 = time.time()
    out, gv, gl, gw = jax.jit(f)(value, loc, weights, ct)
    sums = [float(np.asarray(jnp.sum(x.astype(jnp.float32) ** 2)))
            for x in (out, gv, gl, gw)]
    print(f'b=28 split-path fwd+bwd compiled+ran in {time.time()-t0:.1f}s; '
          f'sq-sums {sums}')
    ok = all(np.isfinite(sums)) and all(s > 0 for s in sums)

    # numeric spot-check on a b=4 slice vs the f32 gather oracle
    sl = slice(0, 4)

    def oracle(v, l, w, gg):
        out, vjp = jax.vjp(lambda vv, ll, ww: msda_xla(
            vv.astype(jnp.float32), shapes, ll, ww), v, l, w)
        gv, gl, gw = vjp(gg)
        return out, gv, gl, gw
    want = jax.jit(oracle)(value[sl], loc[sl], weights[sl], ct[sl])
    got = jax.jit(f)(value[sl], loc[sl], weights[sl], ct[sl])
    names = ['out', 'd_value', 'd_loc', 'd_weights']
    for n, a, bb in zip(names, got, want):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        scale = np.abs(bb).max() + 1e-6
        err = np.abs(a - bb).max() / scale
        print(f'  {n}: max|diff|/scale = {err:.2e}')
        ok &= bool(err < 2e-2)
    print('VMEM-SPLIT CHECK', 'PASS' if ok else 'FAIL')
    return ok


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--small-only', action='store_true')
    ap.add_argument('--bench-only', action='store_true')
    ap.add_argument('--vmem-splits', action='store_true',
                    help='b=28/q=1612 budget-split coverage on hardware')
    args = ap.parse_args()
    if args.vmem_splits:
        sys.exit(0 if check_vmem_splits() else 1)
    ok = True
    if not args.bench_only:
        ok = check_small()
    if not args.small_only and ok:
        bench_train_scale()
    sys.exit(0 if ok else 1)
