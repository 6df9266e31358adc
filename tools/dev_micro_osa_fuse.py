#!/usr/bin/env python
"""Micro-benchmark: OSA concat + 1x1 fuse-conv vs segmented-matmul sum.

The OSA block concatenates input + 5 intermediates (1056 ch at stage3) and
runs a 1x1 conv. If XLA materializes the concat, that is ~2x142 MB of HBM
traffic at stage3; computing y = sum_i x_i @ W_i over kernel slices skips
it. This measures both at real stage shapes (7 cams folded), end-to-end
with the producing convs so fusion opportunities match the model's.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=30)
    args = p.parse_args()

    # (name, HxW @ 7 cams, in_ch, conv_ch, out_ch, n_layers)
    cases = [
        ('stage3', (7, 80, 120), 256, 160, 512, 5),
        ('stage4', (7, 40, 60), 512, 192, 768, 5),
        ('stage2', (7, 160, 240), 128, 128, 256, 5),
    ]
    rng = np.random.default_rng(0)

    for name, (b, h, w), cin, cc, cout, nl in cases:
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
        convs = [jnp.asarray(rng.standard_normal(
            (3, 3, cin if i == 0 else cc, cc)) * 0.05, jnp.bfloat16)
            for i in range(nl)]
        wcat = jnp.asarray(rng.standard_normal(
            (cin + nl * cc, cout)) * 0.05, jnp.bfloat16)

        def chain(x, convs):
            outs = [x]
            for k in convs:
                x = jax.nn.relu(jax.lax.conv_general_dilated(
                    x, k, (1, 1), 'SAME',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC')))
                outs.append(x)
            return outs

        def f_concat(x, convs, wcat):
            outs = chain(x, convs)
            cat = jnp.concatenate(outs, axis=-1)
            y = jnp.einsum('bhwc,co->bhwo', cat, wcat,
                           preferred_element_type=jnp.float32)
            return jax.nn.relu(y).astype(jnp.bfloat16).sum()

        def f_segsum(x, convs, wcat):
            outs = chain(x, convs)
            off = 0
            y = None
            for o in outs:
                wseg = wcat[off:off + o.shape[-1]]
                t = jnp.einsum('bhwc,co->bhwo', o, wseg,
                               preferred_element_type=jnp.float32)
                y = t if y is None else y + t
                off += o.shape[-1]
            return jax.nn.relu(y).astype(jnp.bfloat16).sum()

        for tag, fn in (('concat+1x1', f_concat), ('segsum', f_segsum)):
            jf = jax.jit(fn)
            out = jf(x, convs, wcat)
            float(np.asarray(out))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = jf(x, convs, wcat)
            float(np.asarray(out))
            ms = 1000 * (time.perf_counter() - t0) / args.iters
            print(f'{name} {tag:12s} {ms:7.3f} ms')


if __name__ == '__main__':
    main()
