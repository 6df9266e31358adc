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


def test_streampetr_model_end_to_end():
    """Second model family: full StreamPETR (backbone -> FPN -> dense
    PETRTemporalTransformer -> shared branches) runs jitted, carries the
    temporal memory across frames, and resets on prev_exists=0
    (reference petr_transformer.py:411-741 + the StreamPETR memory queue)."""
    import jax
    import numpy as np
    from far3d_tpu.models.streampetr import (StreamPETR, init_petr_state,
                                             tiny_petr_config)

    cfg = tiny_petr_config()
    b, n = 1, cfg.num_cams
    h, w = cfg.input_hw
    rng = np.random.RandomState(0)
    model = StreamPETR(cfg)

    def frame(seed):
        r = np.random.RandomState(seed)
        intr = np.eye(4, dtype=np.float32)
        intr[0, 0] = intr[1, 1] = 40.0
        intr[0, 2], intr[1, 2] = w / 2, h / 2
        l2i = np.tile(intr[None, None], (b, n, 1, 1))
        return dict(
            images=jnp.asarray(r.randn(b, n, h, w, 3), jnp.float32),
            lidar2img=jnp.asarray(l2i),
            timestamp=jnp.zeros((b,)) + 0.1 * seed,
            ego_pose=jnp.tile(jnp.eye(4)[None], (b, 1, 1)),
            ego_pose_inv=jnp.tile(jnp.eye(4)[None], (b, 1, 1)))

    state = init_petr_state(b, cfg)
    f0 = frame(0)
    variables = model.init(jax.random.PRNGKey(0), state=state,
                           prev_exists=jnp.zeros((b,)), **f0)

    @jax.jit
    def step(variables, state, prev_exists, fr):
        return model.apply(variables, state=state, prev_exists=prev_exists,
                           **fr)

    out = step(variables, state, jnp.zeros((b,)), f0)
    q_total = cfg.num_query + cfg.num_propagated
    assert out['all_cls_scores'].shape == (
        cfg.num_layers, b, q_total, cfg.num_classes)
    assert out['all_bbox_preds'].shape == (cfg.num_layers, b, q_total,
                                           cfg.code_size)
    assert np.isfinite(np.asarray(out['all_bbox_preds'])).all()

    # second frame continues the stream: memory embedding must be non-zero
    # and differ from a fresh-stream (prev_exists=0) run
    st1 = out['state']
    assert np.abs(np.asarray(st1.embedding)).max() > 0
    out_cont = step(variables, st1, jnp.ones((b,)), frame(1))
    out_reset = step(variables, st1, jnp.zeros((b,)), frame(1))
    a = np.asarray(out_cont['all_cls_scores'][-1])
    bb = np.asarray(out_reset['all_cls_scores'][-1])
    assert np.abs(a - bb).max() > 1e-6  # memory actually feeds the decoder

    # gradient flows end-to-end through the dense path
    def loss_fn(params):
        o = model.apply({'params': params, **{k: v for k, v in
                                              variables.items()
                                              if k != 'params'}},
                        state=state, prev_exists=jnp.zeros((b,)), **f0)
        return jnp.sum(o['all_bbox_preds'] ** 2) * 1e-6
    g = jax.grad(loss_fn)(variables['params'])
    leaves = jax.tree_util.tree_leaves(g)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_petr_transformer_non_temporal():
    """PETRTransformer (the reference's registered-but-unused DETR-style
    variant, petr_transformer.py:789-868 + :361-409): encoder + decoder
    stack, per-intermediate shared post-norm, and key_valid masking (the
    key_padding_mask equivalent) — masked tokens must not influence the
    output."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from far3d_tpu.models.petr import PETRTransformer

    rng = np.random.RandomState(0)
    b, t, q, c = 2, 40, 8, 32
    feats = rng.randn(b, t, c).astype(np.float32)
    pos = rng.randn(b, t, c).astype(np.float32)
    qemb = rng.randn(q, c).astype(np.float32)
    valid = np.ones((b, t), bool)
    valid[:, 30:] = False

    model = PETRTransformer(embed_dims=c, num_layers=2,
                            num_encoder_layers=1, num_heads=4, ffn_dims=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                           jnp.asarray(pos), jnp.asarray(qemb),
                           key_valid=jnp.asarray(valid))
    out = model.apply(variables, jnp.asarray(feats), jnp.asarray(pos),
                      jnp.asarray(qemb), key_valid=jnp.asarray(valid))
    assert out.shape == (2, b, q, c)
    assert np.isfinite(np.asarray(out)).all()

    # scrambling the masked tokens must not change the output
    feats2 = feats.copy()
    feats2[:, 30:] = rng.randn(b, 10, c)
    out2 = model.apply(variables, jnp.asarray(feats2), jnp.asarray(pos),
                       jnp.asarray(qemb), key_valid=jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)

    # without the mask the scrambled tokens DO change the output
    out3 = model.apply(variables, jnp.asarray(feats2), jnp.asarray(pos),
                       jnp.asarray(qemb))
    assert np.abs(np.asarray(out3) - np.asarray(out)).max() > 1e-4

    # shared post-norm: per-layer intermediates are LayerNorm'd (unit stats)
    arr = np.asarray(out)
    np.testing.assert_allclose(arr.mean(-1), 0.0, atol=1e-4)
    np.testing.assert_allclose(arr.var(-1), 1.0, atol=1e-2)


def test_flatten_mh_self_attention_matches_torch_mha():
    """FlattenMHSelfAttention claims single-key attention reduces to
    identity + W_o(W_v x); prove it against torch's real MHA run on the
    reference's (T*B, 1, C) reshape (petr_transformer.py:1018-1041)."""
    import torch

    from far3d_tpu.models.petr import FlattenMHSelfAttention

    t, b, c, h = 5, 2, 16, 4
    rng = np.random.RandomState(0)
    x = rng.randn(t * b, 1, c).astype(np.float32)
    pos = rng.randn(t * b, 1, c).astype(np.float32)

    mha = torch.nn.MultiheadAttention(c, h, batch_first=True)
    with torch.no_grad():
        ref = x + mha(torch.tensor(x + pos), torch.tensor(x + pos),
                      torch.tensor(x))[0].numpy()

    mod = FlattenMHSelfAttention(embed_dims=c, num_heads=h, dropout=0.0)
    wv = mha.in_proj_weight[2 * c:].detach().numpy()
    bv = mha.in_proj_bias[2 * c:].detach().numpy()
    wo = mha.out_proj.weight.detach().numpy()
    bo = mha.out_proj.bias.detach().numpy()
    variables = {'params': {
        'v_proj': {'kernel': wv.T, 'bias': bv},
        'out_proj': {'kernel': wo.T, 'bias': bo}}}
    out = mod.apply(variables, jnp.asarray(x), pos=jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-6)
