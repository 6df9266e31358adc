#!/usr/bin/env python
"""Micro-benchmarks for the backbone's conv building blocks on the TPU.

Times individual convs / OSA blocks and MXU-aligned channel variants to
decide where the backbone's ~46 ms goes and what a zero-padded-channel
redesign would buy.

python tools/dev_micro_convs.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    from far3d_tpu.models.layers import ConvBNReLU
    from far3d_tpu.models.vovnet import OSAModule

    rng = np.random.RandomState(0)

    def timed(tag, module, shape, iters=30, **kw):
        x = jnp.asarray(rng.rand(*shape), jnp.bfloat16)
        v = jax.jit(module.init)(jax.random.PRNGKey(0), x, **kw)

        @jax.jit
        def run(v, x):
            return module.apply(v, x, **kw).sum()

        out = run(v, x)
        float(np.asarray(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(v, x)
        float(np.asarray(out))
        ms = 1000 * (time.perf_counter() - t0) / iters
        print(f'{tag:42s} {ms:7.3f} ms')
        return ms

    # --- stem pieces (7 cams, 640x960 input) ---
    timed('stem1 3->64 s2 @640x960', ConvBNReLU(64, 3, stride=2),
          (7, 640, 960, 3))
    timed('stem2 64->64 s1 @320x480', ConvBNReLU(64, 3, stride=1),
          (7, 320, 480, 64))
    timed('stem3 64->128 s2 @320x480', ConvBNReLU(128, 3, stride=2),
          (7, 320, 480, 64))
    timed('stem2 variant 128->128 s1 @320x480', ConvBNReLU(128, 3, stride=1),
          (7, 320, 480, 128))

    # --- single convs at stage3/4 geometry ---
    timed('conv 160->160 @80x120', ConvBNReLU(160, 3), (7, 80, 120, 160))
    timed('conv 256->256 @80x120', ConvBNReLU(256, 3), (7, 80, 120, 256))
    timed('conv 192->192 @40x60', ConvBNReLU(192, 3), (7, 40, 60, 192))
    timed('conv 256->256 @40x60', ConvBNReLU(256, 3), (7, 40, 60, 256))
    timed('conv 512->512 @40x60', ConvBNReLU(512, 3), (7, 40, 60, 512))

    # --- OSA blocks as configured vs aligned ---
    timed('OSA s3 (256->160x5->512) @80x120',
          OSAModule(stage_ch=160, concat_ch=512, layers_per_block=5),
          (7, 80, 120, 256))
    timed('OSA s3 aligned (256->256x5->512)',
          OSAModule(stage_ch=256, concat_ch=512, layers_per_block=5),
          (7, 80, 120, 256))
    timed('OSA s4 (512->192x5->768) @40x60',
          OSAModule(stage_ch=192, concat_ch=768, layers_per_block=5),
          (7, 40, 60, 512))
    timed('OSA s4 aligned (512->256x5->768)',
          OSAModule(stage_ch=256, concat_ch=768, layers_per_block=5),
          (7, 40, 60, 512))

    # eSE cost: OSA without the gate
    class OSANoEse(nn.Module):
        stage_ch: int
        concat_ch: int

        @nn.compact
        def __call__(self, x):
            outputs = [x]
            for i in range(5):
                x = ConvBNReLU(self.stage_ch, kernel=3, name=f'layer{i}')(x)
                outputs.append(x)
            x = jnp.concatenate(outputs, axis=-1)
            return ConvBNReLU(self.concat_ch, kernel=1, name='concat')(x)

    timed('OSA s4 no-eSE', OSANoEse(192, 768), (7, 40, 60, 512))


if __name__ == '__main__':
    main()
