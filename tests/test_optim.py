"""Optimizer construction: param labeling, frozen pseudo points, layer-wise
LR decay wiring (reference far3d.py:260-276 + the registered-but-unused
LearningRateDecayOptimizerConstructor)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from far3d_tpu.config import TrainConfig
from far3d_tpu.train.optim import make_optimizer


def _params():
    return {
        'backbone': {'stage2_block0': {'layer0': {'conv': {
            'kernel': jnp.ones((3, 3, 4, 4))}}},
            'stage5_block0': {'concat': {'conv': {
                'kernel': jnp.ones((1, 1, 4, 4))}}}},
        'pts_head': {'reference_points': jnp.ones((8, 3)),
                     'pseudo_reference_points': jnp.ones((4, 3)),
                     'cls_out': {'kernel': jnp.ones((4, 4))}},
    }


def _updates(cfg, step_count=1):
    params = _params()
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(grads, state, params)
    return upd


def test_frozen_and_backbone_mult():
    cfg = TrainConfig(warmup_iters=0)
    upd = _updates(cfg)
    # pseudo reference points frozen
    assert float(jnp.abs(upd['pts_head']['pseudo_reference_points']).max()) == 0
    # backbone lr = 0.1x main lr
    bb = float(jnp.abs(
        upd['backbone']['stage2_block0']['layer0']['conv']['kernel']).max())
    main = float(jnp.abs(upd['pts_head']['cls_out']['kernel']).max())
    np.testing.assert_allclose(bb / main, cfg.backbone_lr_mult, rtol=1e-4)


def test_layerwise_decay_wiring():
    cfg = dataclasses.replace(TrainConfig(warmup_iters=0), layer_decay=0.5)
    upd = _updates(cfg)
    # stage2 (depth 0) gets decay^4, stage5 (depth 3) decay^1, head decay^0
    s2 = float(jnp.abs(
        upd['backbone']['stage2_block0']['layer0']['conv']['kernel']).max())
    s5 = float(jnp.abs(
        upd['backbone']['stage5_block0']['concat']['conv']['kernel']).max())
    head = float(jnp.abs(upd['pts_head']['cls_out']['kernel']).max())
    np.testing.assert_allclose(s2 / head, 0.5 ** 4, rtol=1e-4)
    np.testing.assert_allclose(s5 / head, 0.5 ** 1, rtol=1e-4)
    # frozen still frozen under layer decay
    assert float(jnp.abs(upd['pts_head']['pseudo_reference_points']).max()) == 0
