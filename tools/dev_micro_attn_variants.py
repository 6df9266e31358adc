#!/usr/bin/env python
"""Attention formulation shoot-out at StreamPETR's cross-attn shape
(q=772, k=6000, h=8, d=32, bf16): jax.nn.dot_product_attention vs a plain
einsum softmax attention vs head-merged variants. Chained in-graph.

python tools/dev_micro_attn_variants.py [--chain 24] [--iters 10]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _common import honor_jax_platforms  # noqa
honor_jax_platforms()


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--chain', type=int, default=24)
    p.add_argument('--iters', type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    B, Q, T, H, D = 1, 772, 6000, 8, 32
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, Q, H, D) / 8, dt)
    k = jnp.asarray(rng.randn(B, T, H, D) / 8, dt)
    v = jnp.asarray(rng.randn(B, T, H, D) / 8, dt)

    def bench(fn, tag):
        @jax.jit
        def run(q, k, v):
            x = q
            for _ in range(args.chain):
                x = fn(x, k, v)
            return x.astype(jnp.float32).sum()
        out = run(q, k, v)
        float(np.asarray(out))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run(q, k, v)
        float(np.asarray(out))
        ms = 1000 * (time.perf_counter() - t0) / args.iters / args.chain
        print(f'{tag:36s} {ms:8.3f} ms/call', flush=True)
        return ms

    def jdpa(q, k, v):
        return jax.nn.dot_product_attention(q, k, v)

    def einsum_attn(q, k, v):
        s = jnp.einsum('bqhd,bkhd->bhqk', q, k) / np.sqrt(D)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum('bhqk,bkhd->bqhd', p, v)

    def einsum_attn_bf16sm(q, k, v):
        s = jnp.einsum('bqhd,bkhd->bhqk', q, k) / np.sqrt(D)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum('bhqk,bkhd->bqhd', p, v)

    def merged_heads(q, k, v):
        # one (Q, H*D) x (H*D, T) matmul is wrong across heads; instead do
        # batched matmul with heads leading: (H, Q, D) @ (H, D, T)
        qh = q[0].transpose(1, 0, 2)          # (H, Q, D)
        kh = k[0].transpose(1, 2, 0)          # (H, D, T)
        s = jnp.matmul(qh, kh) / np.sqrt(D)   # (H, Q, T)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        vh = v[0].transpose(1, 0, 2)          # (H, T, D)
        return jnp.matmul(p, vh).transpose(1, 0, 2)[None]

    bench(jdpa, 'jax.nn.dot_product_attention')
    bench(einsum_attn, 'einsum + f32 softmax')
    bench(einsum_attn_bf16sm, 'einsum + bf16 softmax')
    bench(merged_heads, 'head-batched matmul + f32 sm')


if __name__ == '__main__':
    main()
