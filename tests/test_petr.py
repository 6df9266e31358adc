"""PETR dense-attention stack shape tests."""

import jax
import jax.numpy as jnp
import numpy as np

from far3d_tpu.models.petr import FrustumPE, PETRTemporalTransformer


def test_petr_transformer_shapes():
    b, q, t, c = 2, 16, 64, 32
    model = PETRTemporalTransformer(embed_dims=c, num_layers=2, num_heads=4,
                                    ffn_dims=64)
    rng = jax.random.PRNGKey(0)
    query = jnp.zeros((b, q, c))
    qpos = jax.random.normal(rng, (b, q, c))
    feats = jax.random.normal(rng, (b, t, c))
    fpos = jax.random.normal(rng, (b, t, c))
    mem = jnp.zeros((b, 8, c))
    mpos = jnp.zeros((b, 8, c))
    variables = jax.jit(model.init)(rng, query, qpos, feats, fpos, mem, mpos)
    out = jax.jit(model.apply)(variables, query, qpos, feats, fpos, mem, mpos)
    assert out.shape == (2, b, q, c)
    assert np.isfinite(np.asarray(out)).all()


def test_frustum_pe_shapes():
    b, n = 1, 2
    pe = FrustumPE(embed_dims=32, depth_num=8)
    img2lidar = jnp.tile(jnp.eye(4)[None, None], (b, n, 1, 1))
    variables = jax.jit(pe.init, static_argnums=(1, 2))(
        jax.random.PRNGKey(0), (8, 12), (64, 96), img2lidar)
    out = jax.jit(pe.apply, static_argnums=(1, 2))(
        variables, (8, 12), (64, 96), img2lidar)
    assert out.shape == (b * n, 8 * 12, 32)
