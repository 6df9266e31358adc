"""Multi-scale deformable sampling: XLA formulation vs a dead-simple numpy
oracle implementing mmcv's bilinear convention (x = u*W - 0.5, zero pad)."""

import jax.numpy as jnp
import numpy as np

from far3d_tpu.ops.msda import msda_xla


def numpy_msda(value, shapes, loc, weights):
    b, lt, c = value.shape
    _, q, p, _ = loc.shape
    _, _, g, nl, _ = weights.shape
    cg = c // g
    out = np.zeros((b, q, g, cg), np.float32)
    for bi in range(b):
        offset = 0
        for lvl, (h, w) in enumerate(shapes):
            fmap = value[bi, offset:offset + h * w].reshape(h, w, c)
            for qi in range(q):
                for pi in range(p):
                    x = loc[bi, qi, pi, 0] * w - 0.5
                    y = loc[bi, qi, pi, 1] * h - 0.5
                    x0, y0 = int(np.floor(x)), int(np.floor(y))
                    dx, dy = x - x0, y - y0
                    s = np.zeros(c, np.float32)
                    for (yy, xx, ww) in ((y0, x0, (1 - dy) * (1 - dx)),
                                         (y0, x0 + 1, (1 - dy) * dx),
                                         (y0 + 1, x0, dy * (1 - dx)),
                                         (y0 + 1, x0 + 1, dy * dx)):
                        if 0 <= yy < h and 0 <= xx < w:
                            s += ww * fmap[yy, xx]
                    sg = s.reshape(g, cg)
                    out[bi, qi] += weights[bi, qi, :, lvl, pi][:, None] * sg
            offset += h * w
    return out.reshape(b, q, c)


def test_msda_xla_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    shapes = [(6, 8), (3, 4), (2, 2)]
    lt = sum(h * w for h, w in shapes)
    b, q, p, g, c = 2, 5, 4, 2, 8
    value = rng.randn(b, lt, c).astype(np.float32)
    # locations spanning in-bounds, edge, and out-of-bounds
    loc = rng.uniform(-0.3, 1.3, size=(b, q, p, 2)).astype(np.float32)
    weights = rng.rand(b, q, g, len(shapes), p).astype(np.float32)
    got = np.asarray(msda_xla(jnp.asarray(value), shapes, jnp.asarray(loc),
                              jnp.asarray(weights)))
    want = numpy_msda(value, shapes, loc, weights)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_msda_gradients_finite():
    import jax
    rng = np.random.RandomState(1)
    shapes = [(4, 4), (2, 2)]
    lt = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.randn(1, lt, 4).astype(np.float32))
    loc = jnp.asarray(rng.rand(1, 3, 2, 2).astype(np.float32))
    weights = jnp.asarray(rng.rand(1, 3, 2, 2, 2).astype(np.float32))

    def f(v, l, w):
        return jnp.sum(msda_xla(v, shapes, l, w) ** 2)

    gv, gl, gw = jax.grad(f, argnums=(0, 1, 2))(value, loc, weights)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.isfinite(np.asarray(gl)).all()
    assert np.isfinite(np.asarray(gw)).all()
    assert np.abs(np.asarray(gv)).max() > 0


def test_msda_pallas_interpret_matches_oracle():
    """Pallas kernel (interpret mode on CPU) vs the XLA oracle."""
    import jax
    from unittest import mock
    from jax.experimental import pallas as pl
    from far3d_tpu.ops import msda_pallas as mp

    rng = np.random.RandomState(3)
    shapes = [(6, 8), (3, 4)]
    lt = sum(h * w for h, w in shapes)
    b, q, p, g, c = 2, 4, 3, 2, 8
    value = jnp.asarray(rng.randn(b, lt, c).astype(np.float32))
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, (b, q, p, 2)).astype(np.float32))
    weights = jnp.asarray(rng.rand(b, q, g, len(shapes), p).astype(np.float32))

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k['interpret'] = True
        return orig_call(*a, **k)

    mp._clear_kernel_caches()
    with mock.patch.object(mp.pl, 'pallas_call', interp_call):
        got = np.asarray(mp.msda_pallas(value, tuple(shapes), loc, weights))
    mp._clear_kernel_caches()
    want = np.asarray(msda_xla(value, shapes, loc, weights))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_msda_onehot_matches_oracle():
    from far3d_tpu.ops.msda import msda_onehot_xla
    rng = np.random.RandomState(5)
    shapes = [(6, 8), (3, 4)]
    lt = sum(h * w for h, w in shapes)
    b, q, p, g, c = 2, 5, 3, 2, 8
    value = jnp.asarray(rng.randn(b, lt, c).astype(np.float32))
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, (b, q, p, 2)).astype(np.float32))
    weights = jnp.asarray(rng.rand(b, q, g, len(shapes), p).astype(np.float32))
    got = np.asarray(msda_onehot_xla(value, shapes, loc, weights, row_chunk=8))
    want = np.asarray(msda_xla(value, shapes, loc, weights))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # gradients flow and match the gather formulation
    import jax
    g1 = jax.grad(lambda v, l, w: jnp.sum(
        msda_onehot_xla(v, shapes, l, w, row_chunk=8) ** 2),
        argnums=(0, 1, 2))(value, loc, weights)
    g2 = jax.grad(lambda v, l, w: jnp.sum(
        msda_xla(v, shapes, l, w) ** 2), argnums=(0, 1, 2))(value, loc,
                                                            weights)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-3)


def test_msda_pallas_custom_vjp_gradients():
    """msda_pallas's custom_vjp (interpret-mode fwd + Pallas bwd kernels:
    S^T-matmul d_value, recompute d_wa/d_bw) must match the gather oracle's
    gradients."""
    import jax
    from unittest import mock
    from jax.experimental import pallas as pl
    from far3d_tpu.ops import msda_pallas as mp

    rng = np.random.RandomState(7)
    shapes = ((6, 8), (3, 4))
    lt = sum(h * w for h, w in shapes)
    b, q, p, g, c = 2, 4, 3, 2, 8
    value = jnp.asarray(rng.randn(b, lt, c).astype(np.float32))
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, (b, q, p, 2)).astype(np.float32))
    weights = jnp.asarray(rng.rand(b, q, g, len(shapes), p).astype(np.float32))

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k['interpret'] = True
        return orig_call(*a, **k)

    # fixed cotangent: a squared-loss cotangent would amplify the bf16
    # forward difference through the (large) loc jacobian
    ct = jnp.asarray(rng.randn(b, q, c).astype(np.float32))
    mp._clear_kernel_caches()
    with mock.patch.object(mp.pl, 'pallas_call', interp_call):
        _, vjp1 = jax.vjp(lambda v, l, w: mp.msda_pallas(v, shapes, l, w),
                          value, loc, weights)
        g1 = vjp1(ct)
    mp._clear_kernel_caches()
    _, vjp2 = jax.vjp(lambda v, l, w: msda_xla(v, shapes, l, w),
                      value, loc, weights)
    g2 = vjp2(ct)
    for a, bb in zip(g1, g2):
        bb = np.asarray(bb)
        # atol scaled to tensor magnitude: the kernels stage bf16 on the MXU
        # (the training dtype), so per-element error is relative to the
        # tensor's scale, not absolute (d_loc spans ~±25 here).
        np.testing.assert_allclose(np.asarray(a), bb, rtol=2e-2,
                                   atol=2e-2 + 2e-3 * np.abs(bb).max())


def test_msda_pallas_custom_partitioning_cpu_mesh():
    """The custom_partitioning rule: msda_pallas under a jit with the leading
    B*N axis sharded over a 4-device mesh must equal the unsharded result
    (and gradients), i.e. each device runs the kernel on its batch slice.
    Pallas runs in interpret mode; the mesh is the virtual CPU mesh."""
    import jax
    from unittest import mock
    from jax.experimental import pallas as pl
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from far3d_tpu.ops import msda_pallas as mp

    rng = np.random.RandomState(13)
    shapes = ((6, 8), (3, 4))
    lt = sum(h * w for h, w in shapes)
    b, q, p, g, c = 4, 5, 3, 2, 8
    value = jnp.asarray(rng.randn(b, lt, c).astype(np.float32))
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, (b, q, p, 2)).astype(np.float32))
    weights = jnp.asarray(rng.rand(b, q, g, len(shapes), p).astype(np.float32))
    ct = jnp.asarray(rng.randn(b, q, c).astype(np.float32))

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k['interpret'] = True
        return orig_call(*a, **k)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ('b',))
    shard = NamedSharding(mesh, P('b'))

    def f(v, l, w):
        out, vjp = jax.vjp(lambda v, l, w: mp.msda_pallas(v, shapes, l, w),
                           v, l, w)
        return out, vjp(ct)

    mp._clear_kernel_caches()
    with mock.patch.object(mp.pl, 'pallas_call', interp_call):
        want, want_grads = f(value, loc, weights)          # eager, unsharded
        got, got_grads = jax.jit(
            f, in_shardings=(shard, shard, shard))(value, loc, weights)
    mp._clear_kernel_caches()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    for a, bb in zip(got_grads, want_grads):
        bb = np.asarray(bb)
        np.testing.assert_allclose(np.asarray(a), bb, rtol=2e-2,
                                   atol=2e-2 + 2e-3 * np.abs(bb).max())


def test_msda_pallas_split_paths_match_oracle():
    """Force the budget-split code paths through interpret mode: the
    level-split forward/backward (large batch or training query counts) and
    the group-aligned channel-split of the dV accumulator. Both paths bit
    on real hardware (scoped-VMEM overflows at b=28 and q_pad=1616), so the
    routing/rebasing logic gets its own oracle check."""
    import jax
    from unittest import mock
    from jax.experimental import pallas as pl
    from far3d_tpu.ops import msda_pallas as mp

    rng = np.random.RandomState(11)
    shapes = ((6, 8), (4, 4), (3, 4))
    lt = sum(h * w for h, w in shapes)
    b, q, p, g, c = 2, 5, 3, 2, 8
    value = jnp.asarray(rng.randn(b, lt, c).astype(np.float32))
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, (b, q, p, 2)).astype(np.float32))
    weights = jnp.asarray(rng.rand(b, q, g, len(shapes), p).astype(np.float32))
    ct = jnp.asarray(rng.randn(b, q, c).astype(np.float32))

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k['interpret'] = True
        return orig_call(*a, **k)

    mp._clear_kernel_caches()
    with mock.patch.object(mp.pl, 'pallas_call', interp_call), \
            mock.patch.object(mp, '_FWD_SINGLE_CALL_MAX_B', 1), \
            mock.patch.object(mp, '_FWD_BUDGET_LARGE_Q', 1), \
            mock.patch.object(mp, '_DVAL_BUDGET', 1), \
            mock.patch.object(mp, '_DVAL_BLOCK_BUDGET', 1):
        out, vjp = jax.vjp(lambda v, l, w: mp.msda_pallas(v, shapes, l, w),
                           value, loc, weights)
        g1 = vjp(ct)
        got = np.asarray(out)
    mp._clear_kernel_caches()
    want, vjp2 = jax.vjp(lambda v, l, w: msda_xla(v, shapes, l, w),
                         value, loc, weights)
    g2 = vjp2(ct)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-2, atol=2e-2)
    for a, bb in zip(g1, g2):
        bb = np.asarray(bb)
        np.testing.assert_allclose(np.asarray(a), bb, rtol=2e-2,
                                   atol=2e-2 + 2e-3 * np.abs(bb).max())
