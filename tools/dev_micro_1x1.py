#!/usr/bin/env python
"""Validate the 1x1-conv-as-matmul rewrite: XLA lowers NHWC 1x1 convs at
~50 TF/s on this chip while the same contraction as a reshaped matmul runs at
~150 TF/s (see dev_micro_chain.py). Times both forms at the OSA concat-fuse
shapes.

python tools/dev_micro_1x1.py
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

    def timed(tag, fn, args, flops):
        jfn = jax.jit(fn)
        out = jfn(*args)
        float(np.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(20):
            out = jfn(*args)
        float(np.asarray(out).ravel()[0])
        ms = 1000 * (time.perf_counter() - t0) / 20 / REPS
        print(f'{tag:44s} {ms:7.3f} ms/op   {flops / ms * 1e-9:6.1f} TF/s')

    # concat-fuse shapes (Cin -> Cout) at (7, H, W)
    shapes = [
        (768, 256, 160, 240),    # stage2
        (1056, 512, 80, 120),    # stage3
        (1472, 768, 40, 60),     # stage4
        (1888, 1024, 20, 30),    # stage5
    ]
    for cin, cout, h, w in shapes:
        m = 7 * h * w
        x = jnp.asarray(rng.rand(7, h, w, cin), jnp.bfloat16)
        k4 = jnp.asarray(rng.rand(1, 1, cin, cout) * 0.02, jnp.bfloat16)
        # ping-pong back so the chain keeps a fixed shape
        kback = jnp.asarray(rng.rand(1, 1, cout, cin) * 0.02, jnp.bfloat16)
        flops = 2 * 2 * m * cin * cout  # per rep: there and back

        def conv_fn(x, k4, kback):
            for _ in range(REPS):
                y = jax.lax.conv_general_dilated(
                    x, k4, (1, 1), [(0, 0), (0, 0)],
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                x = jax.lax.conv_general_dilated(
                    y, kback, (1, 1), [(0, 0), (0, 0)],
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            return x.sum()

        def mm_fn(x, k4, kback):
            w1 = k4.reshape(k4.shape[2], k4.shape[3])
            w2 = kback.reshape(kback.shape[2], kback.shape[3])
            for _ in range(REPS):
                y = (x.reshape(-1, w1.shape[0]) @ w1)
                x = (y @ w2).reshape(x.shape)
            return x.sum()

        timed(f'conv1x1 {cin}->{cout}->{cin} @{h}x{w}', conv_fn,
              (x, k4, kback), flops)
        timed(f'matmul  {cin}->{cout}->{cin} @{h}x{w}', mm_fn,
              (x, k4, kback), flops)


if __name__ == '__main__':
    main()
