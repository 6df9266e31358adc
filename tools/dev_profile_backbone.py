#!/usr/bin/env python
"""Per-stage backbone timing on the TPU: times cumulative prefixes of
VoVNet (stem, +stage2, ..., +stage5, +FPN) to locate where the 46 ms goes.

python tools/dev_profile_backbone.py [--iters 30]
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=30)
    p.add_argument('--no-ese', action='store_true')
    args = p.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    from far3d_tpu.config import Far3DConfig
    from far3d_tpu.models.layers import ConvBNReLU
    from far3d_tpu.models.vovnet import (FPN, OSAModule, VoVNet,
                                         _max_pool_ceil)

    cfg = Far3DConfig()
    bc = cfg.backbone
    h, w = cfg.data.input_hw
    bn = cfg.data.num_cams
    x = jnp.asarray(np.random.RandomState(0).rand(bn, h, w, 3),
                    jnp.bfloat16)

    class Prefix(nn.Module):
        upto: int      # 0=stem, 1..4 = stages 2..5, 5 = +FPN

        @nn.compact
        def __call__(self, x):
            x = ConvBNReLU(bc.stem_channels[0], 3, stride=2, name='stem1')(x)
            x = ConvBNReLU(bc.stem_channels[1], 3, stride=1, name='stem2')(x)
            x = ConvBNReLU(bc.stem_channels[2], 3, stride=2, name='stem3')(x)
            outputs = []
            for si in range(min(self.upto, 4)):
                if si + 2 != 2:
                    x = _max_pool_ceil(x)
                for bi in range(bc.blocks_per_stage[si]):
                    x = OSAModule(stage_ch=bc.stage_conv_channels[si],
                                  concat_ch=bc.stage_out_channels[si],
                                  layers_per_block=bc.layers_per_block,
                                  identity=(bi > 0),
                                  name=f's{si}b{bi}')(x)
                outputs.append(x)
            if self.upto == 5:
                return FPN(cfg.neck, name='neck')(outputs)
            return [x]

    names = ['stem', '+stage2', '+stage3', '+stage4', '+stage5', '+fpn']
    prev = 0.0
    rows = {}
    for upto in range(6):
        m = Prefix(upto)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)

        @jax.jit
        def run(v, x, m=m):
            return [f.sum() for f in m.apply(v, x)]

        out = run(v, x)
        float(np.asarray(out[0]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run(v, x)
        float(np.asarray(out[0]))
        ms = 1000 * (time.perf_counter() - t0) / args.iters
        print(f'{names[upto]:10s} cum {ms:7.2f} ms   delta {ms - prev:7.2f} ms')
        rows[names[upto]] = round(ms - prev, 2)
        prev = ms
    print(json.dumps(rows))


if __name__ == '__main__':
    main()
