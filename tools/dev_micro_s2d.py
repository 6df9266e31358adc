#!/usr/bin/env python
"""Space-to-depth rewrite of stride-2 3x3 convs (the MLPerf ResNet conv1
trick): y = conv3x3_s2(x) == conv2x2_s1(s2d(x), K_s2d) with the 3x3 kernel
re-indexed (zero-stuffed) into a 2x2 kernel over 4x channels.

Validates numerical equivalence on CPU-sized inputs and times both forms at
the stem geometries on the TPU.

python tools/dev_micro_s2d.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = 10


def s2d(x):
    """(N, H, W, C) -> (N, H/2, W/2, 4C), channel order (a, b, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def s2d_kernel(k):
    """(3, 3, C, O) -> (2, 2, 4C, O): K_s2d[A,B,(a,b,c),o] = K[2A+a-1,
    2B+b-1, c, o] (zero where the tap index leaves [0, 3))."""
    import jax.numpy as jnp
    _, _, c, o = k.shape
    out = jnp.zeros((2, 2, 2, 2, c, o), k.dtype)
    for A in range(2):
        for a in range(2):
            u = 2 * A + a - 1
            if not 0 <= u < 3:
                continue
            for B in range(2):
                for b in range(2):
                    v = 2 * B + b - 1
                    if not 0 <= v < 3:
                        continue
                    out = out.at[A, B, a, b].set(k[u, v])
    return out.reshape(2, 2, 4 * c, o)


def conv_s2(x, k):
    import jax
    return jax.lax.conv_general_dilated(
        x, k, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def conv_s2d(x, k):
    import jax
    return jax.lax.conv_general_dilated(
        s2d(x), s2d_kernel(k), (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)

    # --- equivalence (f32, small) ---
    x = jnp.asarray(rng.randn(2, 16, 20, 5), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 5, 7) * 0.1, jnp.float32)
    ref = conv_s2(x, k)
    got = conv_s2d(x, k)
    err = float(jnp.abs(ref - got).max())
    print(f'equivalence max |diff| = {err:.2e}')
    assert err < 1e-4, err

    # --- timing at stem geometries ---
    def timed(tag, fn, args, iters=20):
        jfn = jax.jit(fn)
        out = jfn(*args)
        float(np.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(*args)
        float(np.asarray(out).ravel()[0])
        ms = 1000 * (time.perf_counter() - t0) / iters / REPS
        print(f'{tag:44s} {ms:7.3f} ms/op')

    for cin, cout, h, w, tag in ((64, 128, 320, 480, 'stem3'),
                                 (3, 64, 640, 960, 'stem1')):
        x = jnp.asarray(rng.rand(7, h, w, cin), jnp.bfloat16)
        k = jnp.asarray(rng.rand(3, 3, cin, cout) * 0.05, jnp.bfloat16)

        def direct(x, k):
            outs = []
            for _ in range(REPS):
                outs.append(conv_s2(x, k).sum())
            return jnp.stack(outs).sum()

        def vias2d(x, k):
            ks = s2d_kernel(k)
            xs = s2d(x)
            outs = []
            for _ in range(REPS):
                outs.append(jax.lax.conv_general_dilated(
                    xs, ks, (1, 1), [(1, 0), (1, 0)],
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC')).sum())
            return jnp.stack(outs).sum()

        def vias2d_full(x, k):
            # including the s2d input reshuffle every rep
            outs = []
            for _ in range(REPS):
                outs.append(conv_s2d(x, k).sum())
            return jnp.stack(outs).sum()

        timed(f'{tag} {cin}->{cout} s2 direct', direct, (x, k))
        timed(f'{tag} s2d (reshuffle amortized)', vias2d, (x, k))
        timed(f'{tag} s2d (incl. reshuffle)', vias2d_full, (x, k))


if __name__ == '__main__':
    main()
