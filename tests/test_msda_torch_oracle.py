"""Independent MSDA oracle: torch `F.grid_sample`.

The in-repo numpy oracle (tests/test_msda.py) and `msda_xla` were written by
the same author, so a shared misunderstanding of mmcv's bilinear convention
would pass both. This file builds the oracle from *torch's* bilinear sampler
instead — the exact primitive mmcv's pure-pytorch fallback
(`multi_scale_deformable_attn_pytorch`) uses at the reference call site
(detr3d_transformer.py:561-563): `F.grid_sample(..., mode='bilinear',
padding_mode='zeros', align_corners=False)` on grids mapped by
`2 * loc - 1`.  With align_corners=False that convention is exactly
x_pix = u * W - 0.5 with zero contribution from out-of-bounds corners — the
convention our kernels claim to implement. If our reading of mmcv is wrong,
this test fails even though the in-house oracle agrees with us.

Covers in-bounds, out-of-bounds (partial and fully outside), level-boundary
(u,v in {0, 1}) and exact-pixel-center locations, for both `msda_xla` and the
Pallas kernel in interpret mode.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

from far3d_tpu.ops.msda import msda_xla  # noqa: E402


def torch_msda(value, shapes, loc, weights):
    """Grid-sample based MSDA with the repo's (shared-location) contract.

    value:   (B, L_total, C) numpy
    shapes:  [(H, W)] per level
    loc:     (B, Q, P, 2) normalized (u, v), shared over groups & levels
    weights: (B, Q, G, L, P)
    Returns (B, Q, C) numpy.
    """
    b, lt, c = value.shape
    _, q, p, _ = loc.shape
    _, _, g, nl, _ = weights.shape
    cg = c // g
    v = torch.from_numpy(value)
    l_t = torch.from_numpy(loc)
    w_t = torch.from_numpy(weights)

    out = torch.zeros(b, q, g, cg, dtype=torch.float64)
    offset = 0
    for lvl, (h, w) in enumerate(shapes):
        # (B, C, H, W) feature map for this level
        fmap = v[:, offset:offset + h * w].transpose(1, 2).reshape(b, c, h, w)
        grid = 2.0 * l_t - 1.0                       # (B, Q, P, 2) in [-1, 1]
        samp = F.grid_sample(fmap.double(), grid.double(), mode='bilinear',
                             padding_mode='zeros', align_corners=False)
        # samp: (B, C, Q, P) -> (B, Q, P, G, Cg)
        samp = samp.permute(0, 2, 3, 1).reshape(b, q, p, g, cg)
        wl = w_t[:, :, :, lvl, :].double()           # (B, Q, G, P)
        out = out + torch.einsum('bqpgc,bqgp->bqgc', samp, wl)
        offset += h * w
    return out.reshape(b, q, c).numpy().astype(np.float32)


def _case(seed, loc_lo, loc_hi, shapes=((6, 8), (3, 4), (2, 2)),
          b=2, q=5, p=4, g=2, c=8):
    rng = np.random.RandomState(seed)
    lt = sum(h * w for h, w in shapes)
    value = rng.randn(b, lt, c).astype(np.float32)
    loc = rng.uniform(loc_lo, loc_hi, size=(b, q, p, 2)).astype(np.float32)
    weights = rng.rand(b, q, g, len(shapes), p).astype(np.float32)
    return value, list(shapes), loc, weights


@pytest.mark.parametrize('seed,lo,hi', [
    (0, 0.05, 0.95),      # strictly in-bounds
    (1, -0.3, 1.3),       # mixed in/out of bounds
    (2, 1.05, 1.6),       # fully outside -> zeros
])
def test_msda_xla_matches_torch_grid_sample(seed, lo, hi):
    value, shapes, loc, weights = _case(seed, lo, hi)
    want = torch_msda(value, shapes, loc, weights)
    got = np.asarray(msda_xla(jnp.asarray(value), shapes, jnp.asarray(loc),
                              jnp.asarray(weights)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_msda_xla_matches_torch_at_boundaries():
    """u,v exactly at {0, 1} and at exact pixel centers ((i+0.5)/W)."""
    value, shapes, _, weights = _case(3, 0, 1, b=1, q=4, p=4)
    # handcrafted: corners of the unit square and two exact pixel centers
    loc = np.array([[
        [[0.0, 0.0], [1.0, 1.0], [0.0, 1.0], [1.0, 0.0]],
        [[0.5, 0.5], [(0 + .5) / 8, (0 + .5) / 6], [(7 + .5) / 8, (5 + .5) / 6],
         [0.999999, 0.000001]],
        [[0.25, 0.75], [1.0, 0.5], [0.5, 1.0], [0.0, 0.5]],
        [[1e-7, 1e-7], [1 - 1e-7, 1 - 1e-7], [0.5, 0.0], [0.5, 1.0]],
    ]], np.float32)
    want = torch_msda(value, shapes, loc, weights)
    got = np.asarray(msda_xla(jnp.asarray(value), shapes, jnp.asarray(loc),
                              jnp.asarray(weights)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_msda_pallas_interpret_matches_torch_grid_sample():
    from unittest import mock
    from jax.experimental import pallas as pl
    from far3d_tpu.ops import msda_pallas as mp

    value, shapes, loc, weights = _case(4, -0.2, 1.2, shapes=((6, 8), (3, 4)))
    want = torch_msda(value, shapes, loc, weights)

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k['interpret'] = True
        return orig_call(*a, **k)

    mp._clear_kernel_caches()
    with mock.patch.object(mp.pl, 'pallas_call', interp_call):
        got = np.asarray(mp.msda_pallas(jnp.asarray(value), tuple(shapes),
                                        jnp.asarray(loc),
                                        jnp.asarray(weights)))
    mp._clear_kernel_caches()
    # kernel stages bf16 on the MXU -> looser tolerance than the f32 XLA path
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
