#!/usr/bin/env python
"""Micro-benchmark of the PETR decoder-layer components at StreamPETR's
production shapes (772 queries, 6000 dense tokens, 384 memory keys, C=256,
8 heads). Each component is chained CHAIN times in-graph (output feeds the
next input) so per-call dispatch (~25 ms through the tunnel) amortizes away.

python tools/dev_micro_petr_layer.py [--chain 24] [--iters 10]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()


def timed(fn, args, chain, iters, tag):
    import numpy as np
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    ms = 1000 * (time.perf_counter() - t0) / iters / chain
    print(f'{tag:34s} {ms:8.3f} ms/call', flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--chain', type=int, default=24)
    p.add_argument('--iters', type=int, default=10)
    args = p.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    from far3d_tpu.models.layers import FFN
    from far3d_tpu.models.petr import FlashMHA, PETRTemporalDecoderLayer

    B, Q, T, M, C, H = 1, 772, 6000, 384, 256, 8
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)

    q = jnp.asarray(rng.randn(B, Q, C), dt)
    qp = jnp.asarray(rng.randn(B, Q, C), dt)
    feats = jnp.asarray(rng.randn(B, T, C), dt)
    fp = jnp.asarray(rng.randn(B, T, C), dt)
    mem = jnp.asarray(rng.randn(B, M, C), dt)
    mp = jnp.asarray(rng.randn(B, M, C), dt)

    def chain_jit(module, call):
        v = jax.jit(module.init)(jax.random.PRNGKey(0), q, qp, feats, fp,
                                 mem, mp)

        @jax.jit
        def run(v, q, qp, feats, fp, mem, mp):
            x = q
            for _ in range(args.chain):
                x = call(module, v, x, qp, feats, fp, mem, mp)
            return x.astype(jnp.float32).sum()
        return run, v

    class CrossAttn(nn.Module):
        @nn.compact
        def __call__(self, q, qp, feats, fp, mem, mp):
            return FlashMHA(C, H, name='ca')(q + qp, feats + fp, feats)

    class SelfAttn(nn.Module):
        @nn.compact
        def __call__(self, q, qp, feats, fp, mem, mp):
            k = jnp.concatenate([q, mem], axis=1)
            kp = jnp.concatenate([qp, mp], axis=1)
            return nn.MultiHeadDotProductAttention(
                num_heads=H, qkv_features=C, dtype=q.dtype, name='sa')(
                q + qp, inputs_k=k + kp, inputs_v=k)

    class JustFFN(nn.Module):
        @nn.compact
        def __call__(self, q, qp, feats, fp, mem, mp):
            return FFN(C, 2048, 0.1, name='ffn')(q, True)

    class FullLayer(nn.Module):
        @nn.compact
        def __call__(self, q, qp, feats, fp, mem, mp):
            return PETRTemporalDecoderLayer(C, H, 2048, 0.1, name='l')(
                q, qp, feats, fp, mem, mp, None, True)

    for tag, mod in (('cross_attn (772x6000)', CrossAttn()),
                     ('self_attn (772x1156)', SelfAttn()),
                     ('ffn (772x256x2048)', JustFFN()),
                     ('full decoder layer', FullLayer())):
        run, v = chain_jit(mod, lambda m, v, *a: m.apply(v, *a))
        timed(run, (v, q, qp, feats, fp, mem, mp), args.chain, args.iters,
              tag)


if __name__ == '__main__':
    main()
