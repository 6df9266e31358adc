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


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--small-only', action='store_true')
    ap.add_argument('--bench-only', action='store_true')
    args = ap.parse_args()
    ok = True
    if not args.bench_only:
        ok = check_small()
    if not args.small_only and ok:
        bench_train_scale()
    sys.exit(0 if ok else 1)
