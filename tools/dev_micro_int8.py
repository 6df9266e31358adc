#!/usr/bin/env python
"""Is int8 conv on the v5e MXU actually ~2x bf16 at the backbone's shapes?

The backbone is tile-padding-bound at the bf16 peak (docs/PROFILE.md): the
waste fraction is fixed by the architecture's channel widths, but int8
doubles the MXU's per-cycle throughput (s8xs8->s32), so a quantized serving
path would halve absolute conv time IF XLA lowers s8 convs to the MXU at
these shapes. This measures exactly that, chained in-graph (single-call
timings are meaningless through the tunnel — ~25 ms/call dispatch).

Each chain step mimics the real quantized pipeline epilogue: s32 accum ->
f32 scale (per-channel) -> ReLU -> requantize to s8.

python tools/dev_micro_int8.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    rng = np.random.RandomState(0)
    DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ('NHWC', 'HWIO', 'NHWC'))

    def timed(tag, fn, args, flops, iters=30):
        run = jax.jit(fn)
        out = run(*args)
        float(np.asarray(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(*args)
        float(np.asarray(out))
        ms = 1000 * (time.perf_counter() - t0) / iters
        print(f'{tag:46s} {ms:8.3f} ms   {flops / ms / 1e9:7.1f} TF/s')
        return ms

    CHAIN = 8

    def bench_pair(tag, spatial, cin, cout, k=3):
        h, w = spatial
        n = 7
        flops = CHAIN * 2 * n * h * w * k * k * cin * cout

        xb = jnp.asarray(rng.rand(n, h, w, cin) - 0.5, jnp.bfloat16)
        wb = jnp.asarray(rng.rand(k, k, cin, cout) - 0.5, jnp.bfloat16)

        def chain_bf16(x, w):
            for _ in range(CHAIN):
                x = lax.conv_general_dilated(
                    x, w, (1, 1), 'SAME', dimension_numbers=DN)
                x = jax.nn.relu(x)
                if x.shape[-1] != cin:      # keep the chain type-stable
                    x = x[..., :cin]
            return jnp.float32(x.sum())

        xi = jnp.asarray(rng.randint(-127, 127, (n, h, w, cin)), jnp.int8)
        wi = jnp.asarray(rng.randint(-127, 127, (k, k, cin, cout)), jnp.int8)
        sc = jnp.asarray(rng.rand(cout) * 1e-3, jnp.float32)

        def chain_int8(x, w, s):
            for _ in range(CHAIN):
                acc = lax.conv_general_dilated(
                    x, w, (1, 1), 'SAME', dimension_numbers=DN,
                    preferred_element_type=jnp.int32)
                y = jax.nn.relu(acc.astype(jnp.float32) * s)
                # requantize for the next layer (per-tensor act scale)
                x = jnp.clip(jnp.round(y * 16.0), -127, 127).astype(jnp.int8)
                if x.shape[-1] != cin:
                    x = x[..., :cin]
            return jnp.float32(x.sum())

        b = timed(f'bf16 {tag}', chain_bf16, (xb, wb), flops)
        i = timed(f'int8 {tag}', chain_int8, (xi, wi, sc), flops)
        print(f'     -> int8 speedup {b / i:5.2f}x')

    # stage shapes from the profile table (docs/PROFILE.md)
    bench_pair('160x160 3x3 @80x120 (stage3)', (80, 120), 160, 160)
    bench_pair('192x192 3x3 @40x60  (stage4)', (40, 60), 192, 192)
    bench_pair('256x256 3x3 @80x120 (aligned)', (80, 120), 256, 256)
    bench_pair('512x512 3x3 @40x60  (aligned)', (40, 60), 512, 512)
    bench_pair('64x64   3x3 @320x480 (stem2)', (320, 480), 64, 64)
    # concat-fuse 1x1 at stage3 (1056 -> 512)
    bench_pair('1056->1056 1x1 @80x120 (concat)', (80, 120), 1056, 1056, k=1)

    # ---- beyond-backbone candidates (VERDICT r3 #6): FPN output convs,
    # YOLOX tower convs, depth-net convs. All 256-ch 3x3 at the four level
    # spatials of the 640x960 input; the 2D heads total ~2.6 ms and the FPN
    # ~2 ms of the 71 ms frame, so these micros bound the end-to-end win.
    for hw, tag in (((80, 120), 'P3'), ((40, 60), 'P4'),
                    ((20, 30), 'P5'), ((10, 15), 'P6')):
        bench_pair(f'256x256 3x3 @{hw[0]}x{hw[1]} (fpn/yolox {tag})',
                   hw, 256, 256)


if __name__ == '__main__':
    main()
