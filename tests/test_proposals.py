"""Static top-K proposal selection vs the reference's dynamic filter
semantics (yolox_head.py:424-467), plus attention-mask structure and
grid-mask statistics."""

import jax
import jax.numpy as jnp
import numpy as np

from far3d_tpu.models.farhead import build_attn_mask
from far3d_tpu.models.heads2d import select_proposals
from far3d_tpu.ops.grid_mask import grid_mask


def _make_outs(rng, bn, hw_list, ncls=5):
    outs = {'cls_scores': [], 'objectnesses': [], 'bbox_preds': [],
            'centers2d_offsets': []}
    for (h, w) in hw_list:
        outs['cls_scores'].append(
            jnp.asarray(rng.randn(bn, h, w, ncls).astype(np.float32)))
        outs['objectnesses'].append(
            jnp.asarray(rng.randn(bn, h, w, 1).astype(np.float32)))
        outs['bbox_preds'].append(
            jnp.asarray(rng.randn(bn, h, w, 4).astype(np.float32) * 0.1))
        outs['centers2d_offsets'].append(
            jnp.asarray(np.zeros((bn, h, w, 2), np.float32)))
    return outs


def test_select_proposals_matches_threshold_filter():
    rng = np.random.RandomState(0)
    b, n = 1, 2
    hw = [(8, 12), (4, 6)]
    strides = (8, 16)
    outs = _make_outs(rng, b * n, hw)
    k = 64
    thr = 0.1
    got = select_proposals(outs, b, n, strides, k, thr)

    # brute force: per level sample weight + 3x3 local max + threshold
    import scipy.ndimage as ndi
    keep_set = set()
    weights = {}
    for li, (h, w) in enumerate(hw):
        cls = np.asarray(outs['cls_scores'][li])
        obj = np.asarray(outs['objectnesses'][li])
        sw = (1 / (1 + np.exp(-obj[..., 0]))) * \
            (1 / (1 + np.exp(-cls.max(-1))))
        mx = ndi.maximum_filter(sw, size=(1, 3, 3), mode='constant')
        kept = (sw == mx) & (sw > thr)
        for cam in range(n):
            for (y, x) in zip(*np.nonzero(kept[cam])):
                flat = sum(hh * ww for hh, ww in hw[:li]) + y * w + x
                keep_set.add((cam, int(flat)))
                weights[(cam, int(flat))] = sw[cam, y, x]

    got_set = {(int(c), int(f)) for c, f, v in
               zip(np.asarray(got['cam_idx'][0]),
                   np.asarray(got['flat_idx'][0]),
                   np.asarray(got['valid'][0])) if v}
    assert len(keep_set) <= k, 'test setup: raise k'
    assert got_set == keep_set
    # scores of valid proposals match the brute-force sample weights
    for c, f, v, s in zip(np.asarray(got['cam_idx'][0]),
                          np.asarray(got['flat_idx'][0]),
                          np.asarray(got['valid'][0]),
                          np.asarray(got['scores'][0, :, 0])):
        if v:
            assert abs(s - weights[(int(c), int(f))]) < 1e-5


def test_proposal_budget_covers_realistic_density():
    """At a realistic dense-frame density (~200 visible 2D GTs across 7
    cams), the shipped K=256 budget selects EVERY thresholded local-max peak
    — i.e. it is equivalent to the reference's unbounded filter
    (yolox_head.py:437-458) — while round 1's K=128 provably clips.
    Curve: tools/eval_recall.py --synthetic (docs/PARITY.md)."""
    from far3d_tpu.config import Far3DConfig
    cfg = Far3DConfig()
    k = cfg.roi2d.num_proposals_2d
    assert k >= 256

    rng = np.random.default_rng(4)
    n_cams = 7
    hw = [(20, 30), (10, 15)]
    strides = (8, 16)
    n_peaks = 200
    outs = {
        'cls_scores': [jnp.full((n_cams, h, w, 1), -20.0) for h, w in hw],
        'objectnesses': [jnp.full((n_cams, h, w, 1), 20.0) for h, w in hw],
        'bbox_preds': [jnp.zeros((n_cams, h, w, 4)) for h, w in hw],
    }
    # paint isolated peaks on a coarse lattice so the 3x3 local-max keeps all
    placed = set()
    planes = [np.array(outs['cls_scores'][0]),
              np.array(outs['cls_scores'][1])]
    while len(placed) < n_peaks:
        ci = int(rng.integers(n_cams))
        li = int(rng.integers(2))
        h, w = hw[li]
        y = int(rng.integers(1, (h - 1) // 2)) * 2
        x = int(rng.integers(1, (w - 1) // 2)) * 2
        if (ci, li, y, x) in placed:
            continue
        placed.add((ci, li, y, x))
        s = float(rng.uniform(0.2, 0.99))
        planes[li][ci, y, x, 0] = np.log(s / (1 - s))
    outs['cls_scores'] = [jnp.asarray(p) for p in planes]

    sel = select_proposals(outs, 1, n_cams, strides, k, 0.1)
    n_valid = int(np.asarray(sel['valid'][0]).sum())
    assert n_valid == n_peaks
    assert n_peaks > 128     # the round-1 budget would have clipped this


def test_attn_mask_dn_group_isolation():
    pad, gs, nq, k2d, nprop, mem = 12, 6, 4, 3, 2, 5
    pv = jnp.asarray([[True, False, True]])
    dv = jnp.ones((1, pad), bool).at[0, 5].set(False)
    m = np.asarray(build_attn_mask(pad, gs, nq, k2d, nprop, mem, pv, dv))[0]
    nqt = pad + nq + k2d + nprop
    assert m.shape == (nqt, nqt + mem)
    # group 0 rows (0..5) can see own group's valid DN cols, not group 1's
    assert not m[0, 1]
    assert m[0, 6]          # other group blocked
    assert m[0, 5]          # invalid DN slot blocked even within group
    # match query rows can't see any DN col, can see valid proposals + memory
    r = pad + 1
    assert m[r, :pad].all()
    p0 = pad + nq
    assert not m[r, p0]     # valid proposal
    assert m[r, p0 + 1]     # invalid proposal blocked
    assert not m[r, p0 + 2]
    assert not m[r, nqt:].any()   # memory always visible
    # DN rows can see non-DN keys (DINO semantics)
    assert not m[0, pad:pad + nq].any()


def test_grid_mask_statistics():
    imgs = jnp.ones((2, 3, 64, 96, 3))
    out = np.asarray(grid_mask(jax.random.PRNGKey(3), imgs, prob=1.0))
    kept = out.mean()
    # union of stripes keeps roughly 50-95% of pixels
    assert 0.3 < kept < 0.99
    # mask shared across batch/cameras
    m0 = out[0, 0, :, :, 0]
    m1 = out[1, 2, :, :, 0]
    np.testing.assert_array_equal(m0, m1)
    # prob=0 -> identity
    out2 = np.asarray(grid_mask(jax.random.PRNGKey(3), imgs, prob=0.0))
    np.testing.assert_array_equal(out2, np.ones_like(out2))
