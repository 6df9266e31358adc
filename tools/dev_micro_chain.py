#!/usr/bin/env python
"""Chained in-graph micro-benchmarks: N dependent repetitions of one op in a
single jit program, so per-call dispatch overhead (~1 ms through this
tunneled runtime) amortizes away. Calibrates the achievable matmul peak and
the real cost of the backbone's conv shapes.

python tools/dev_micro_chain.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = 10


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)

    def timed(tag, fn, args, flops_per_rep, iters=20):
        jfn = jax.jit(fn)
        out = jfn(*args)
        float(np.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(*args)
        float(np.asarray(out).ravel()[0])
        ms = 1000 * (time.perf_counter() - t0) / iters / REPS
        tf = flops_per_rep / (ms / 1000) / 1e12
        print(f'{tag:44s} {ms:7.3f} ms/op   {tf:6.1f} TF/s')

    # --- matmul peak calibration: (67200,1536)x(1536,256)x(256,1536) pairs
    m = 67200
    x0 = jnp.asarray(rng.rand(m, 1536), jnp.bfloat16)
    w1 = jnp.asarray(rng.rand(1536, 256), jnp.bfloat16)
    w2 = jnp.asarray(rng.rand(256, 1536), jnp.bfloat16)

    def mm_chain(x, w1, w2):
        for _ in range(REPS):
            x = (x @ w1) @ w2
        return x.sum()

    timed('matmul pair 67k x (1536->256->1536)', mm_chain, (x0, w1, w2),
          2 * 2 * m * 1536 * 256)

    # --- conv chains at backbone geometries (same-shape in/out) ---
    def conv_chain(cin, h, w, n=7, k=3):
        x = jnp.asarray(rng.rand(n, h, w, cin), jnp.bfloat16)
        ker = jnp.asarray(rng.rand(k, k, cin, cin) * 0.01, jnp.bfloat16)

        def fn(x, ker):
            for _ in range(REPS):
                x = jax.lax.conv_general_dilated(
                    x, ker, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            return x.sum()

        flops = 2 * n * h * w * k * k * cin * cin
        timed(f'conv {cin}x{cin} {k}x{k} @{h}x{w}', fn,
              (x, ker), flops)

    conv_chain(64, 320, 480)
    conv_chain(128, 160, 240)
    conv_chain(160, 80, 120)
    conv_chain(256, 80, 120)
    conv_chain(192, 40, 60)
    conv_chain(256, 40, 60)
    conv_chain(512, 40, 60)
    # batch*spatial folded bigger: all cams at stage4 but 4x spatial rows
    conv_chain(192, 80, 120)
    # 1x1 convs (concat fuse shapes)
    conv_chain(512, 80, 120, k=1)
    conv_chain(768, 40, 60, k=1)


if __name__ == '__main__':
    main()
