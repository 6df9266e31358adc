"""Denoising query machinery tests (reference semantics farhead.py:315-429)."""

import jax
import jax.numpy as jnp
import numpy as np

from far3d_tpu.config import tiny_test_config
from far3d_tpu.train.dn import build_dn_queries


def _setup(n_gt=3):
    cfg = tiny_test_config().head
    pc = tiny_test_config().pc_range
    g = 4  # == dn_max_gt in tiny config
    rng = np.random.RandomState(0)
    boxes = np.zeros((1, g, 7), np.float32)
    boxes[0, :, :3] = rng.uniform(-5, 5, (g, 3))
    boxes[0, :, 2] = rng.uniform(1, 8, g)
    boxes[0, :, 3:6] = rng.uniform(0.5, 2, (g, 3))
    labels = rng.randint(0, cfg.num_classes, (1, g))
    mask = np.zeros((1, g), bool)
    mask[0, :n_gt] = True
    return cfg, pc, jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask)


def test_dn_shapes_and_masks():
    cfg, pc, boxes, labels, mask = _setup()
    dn = jax.jit(lambda k: build_dn_queries(k, boxes, labels, mask, cfg, pc))(
        jax.random.PRNGKey(0))
    pad = cfg.dn_groups * cfg.dn_max_gt * cfg.num_smp_per_gt
    assert dn['ref_points'].shape == (1, pad, 3)
    assert dn['valid'].shape == (1, pad)
    # exactly groups * n_gt * num_smp valid slots
    assert int(dn['valid'].sum()) == cfg.dn_groups * 3 * cfg.num_smp_per_gt
    # ref points clamped to [0, 1]
    rp = np.asarray(dn['ref_points'])
    assert rp.min() >= 0.0 and rp.max() <= 1.0
    # per group, exactly n_gt positives matched (Hungarian matches all GTs)
    bm = np.asarray(dn['bbox_mask']).reshape(cfg.dn_groups, -1)
    assert (bm.sum(1) == 3).all()
    # matched labels are real classes; others are background
    lbl = np.asarray(dn['labels'])[0]
    assert ((lbl == cfg.num_classes) | (lbl < cfg.num_classes)).all()
    assert (lbl[~np.asarray(dn['valid'])[0]] == cfg.num_classes).all()
    assert float(dn['num_tgt']) == cfg.dn_groups * 3


def test_dn_budget_matches_reference_at_typical_density():
    """The shipped static budget (10 groups x 20 GT slots x 3) supervises
    exactly the reference's DN sample set — groups = min(10, 600 // num_gt)
    (farhead.py:333-334, far3d.py:83 scalar=10 / farhead.py:79
    query_num_dn=600) — for every frame with <= dn_max_gt GTs; denser frames
    clip to the first dn_max_gt GTs (documented in PARITY.md)."""
    from far3d_tpu.config import HeadConfig
    cfg = HeadConfig()
    assert cfg.dn_groups == 10 and cfg.dn_max_gt == 20
    for num_gt in (1, 3, 10, 20):
        ref_groups = min(10, 600 // num_gt)
        ref_samples = ref_groups * num_gt * cfg.num_smp_per_gt
        ours = cfg.dn_groups * min(num_gt, cfg.dn_max_gt) * cfg.num_smp_per_gt
        assert ours == ref_samples, (num_gt, ours, ref_samples)

    # and the actual builder produces that many valid slots at full config
    from far3d_tpu.config import PC_RANGE
    rng = np.random.RandomState(2)
    g_slots, n_gt = 160, 15
    boxes = np.zeros((1, g_slots, 7), np.float32)
    boxes[0, :, :3] = rng.uniform(-100, 100, (g_slots, 3))
    boxes[0, :, 3:6] = rng.uniform(0.5, 4, (g_slots, 3))
    labels = rng.randint(0, cfg.num_classes, (1, g_slots))
    mask = np.zeros((1, g_slots), bool)
    mask[0, :n_gt] = True
    dn = jax.jit(lambda k: build_dn_queries(
        k, jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask), cfg,
        PC_RANGE))(jax.random.PRNGKey(3))
    assert int(dn['valid'].sum()) == cfg.dn_groups * n_gt * cfg.num_smp_per_gt
    assert float(dn['num_tgt']) == cfg.dn_groups * n_gt


def test_dn_positive_noise_scale():
    """Positive samples stay within size/2 of the GT center; negative noise is
    log-range-modulated so it grows with distance (farhead.py:344-361)."""
    cfg, pc, boxes, labels, mask = _setup(n_gt=4)
    dn = build_dn_queries(jax.random.PRNGKey(1), boxes, labels, mask, cfg, pc)
    lo = np.asarray(pc[:3])
    hi = np.asarray(pc[3:6])
    rp = np.asarray(dn['ref_points']).reshape(
        cfg.dn_groups, cfg.num_smp_per_gt, cfg.dn_max_gt, 3)
    centers_metric = rp * (hi - lo) + lo
    gt_centers = np.asarray(boxes)[0, :, :3]
    sizes = np.asarray(boxes)[0, :, 3:6]
    # positives (slot block 0): |noise| <= size/2 * noise_scale (pre-clamp)
    pos = centers_metric[:, 0]                      # (groups, gmax, 3)
    err = np.abs(pos - gt_centers[None])
    bound = (sizes[None] / 2) * cfg.dn_noise_scale + 1e-4
    # allow clamp effects at the range border
    inside = (gt_centers[None] + bound <= hi) & (gt_centers[None] - bound >= lo)
    inside = np.broadcast_to(inside, err.shape)
    bound = np.broadcast_to(bound, err.shape)
    assert (err[inside] <= bound[inside] + 1e-4).all()
