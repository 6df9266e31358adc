"""StreamPETR training step: the second model family's training path.

Reuses the framework's head-agnostic set-prediction machinery — the
on-device auction Hungarian matcher and per-layer focal+L1 losses
(`train/losses3d.py`, duck-typed on the config) — over the 10-dim nuScenes
code (velocity appended, code weights 0.2). No DN branch (the assembled
StreamPETR head has none; the reference repo's PETR stack is inference-only
dead weight there, petr_transformer.py). Optimizer/schedule shared with
Far3D (`train/optim.py`: AdamW, cosine, backbone LR mult, grad clip).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig
from ..models.farhead import TemporalState
from ..models.streampetr import (StreamPETR, StreamPETRConfig,
                                 init_petr_state)
from ..ops.grid_mask import grid_mask
from .losses3d import farhead_loss
from .optim import make_optimizer
from .step import TrainBatch, TrainState


def create_petr_train_state(cfg: StreamPETRConfig, rng: jax.Array,
                            batch: int,
                            train_cfg: TrainConfig = TrainConfig()
                            ) -> Tuple[TrainState, TemporalState]:
    model = StreamPETR(cfg)
    h, w = cfg.input_hw
    n = cfg.num_cams
    tstate = init_petr_state(batch, cfg)
    variables = jax.jit(model.init)(
        rng,
        images=jnp.zeros((batch, n, h, w, 3)),
        lidar2img=jnp.tile(jnp.eye(4)[None, None], (batch, n, 1, 1)),
        state=tstate, prev_exists=jnp.zeros((batch,)),
        timestamp=jnp.zeros((batch,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (batch, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (batch, 1, 1)))
    params = variables['params']
    tx = make_optimizer(train_cfg, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        stats=variables.get('stats', {}), batch_stats={},
        opt_state=tx.init(params),
        ema_params=params if train_cfg.ema_decay > 0 else None), tstate


def make_petr_train_step(cfg: StreamPETRConfig,
                         train_cfg: TrainConfig = TrainConfig()):
    """Returns a jittable train_step(state, tstate, batch, rng). `batch` is
    the shared TrainBatch (2D/depth GT fields unused)."""
    model = StreamPETR(cfg)
    tx = None

    def train_step(state: TrainState, tstate: TemporalState,
                   batch: TrainBatch, rng: jax.Array):
        nonlocal tx
        rng_gm, rng_drop = jax.random.split(
            jax.random.fold_in(rng, state.step))
        images = batch.images
        if jnp.issubdtype(images.dtype, jnp.integer):
            from ..config import IMG_MEAN, IMG_STD
            mean = jnp.asarray(IMG_MEAN, jnp.float32)
            std = jnp.asarray(IMG_STD, jnp.float32)
            images = (images.astype(jnp.float32) - mean) / std
        if train_cfg.use_grid_mask:
            images = grid_mask(rng_gm, images, train_cfg.grid_mask_prob)
        if train_cfg.dtype == 'bfloat16':
            images = images.astype(jnp.bfloat16)
        # 10-dim target boxes: gravity-center box + velocity
        gt_boxes9 = jnp.concatenate(
            [batch.gt_boxes, batch.gt_velocity], axis=-1)

        def loss_fn(params):
            out = model.apply(
                {'params': params, 'stats': state.stats},
                images=images, lidar2img=batch.lidar2img, state=tstate,
                prev_exists=batch.prev_exists, timestamp=batch.timestamp,
                ego_pose=batch.ego_pose, ego_pose_inv=batch.ego_pose_inv,
                deterministic=False, rngs={'dropout': rng_drop})
            losses = farhead_loss(out, gt_boxes9, batch.gt_labels,
                                  batch.gt_mask, None, cfg)
            total = sum(jax.tree_util.tree_leaves(losses))
            return total, (losses, out['state'])

        grads, (losses, new_tstate) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        if tx is None:
            tx = make_optimizer(train_cfg, state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics['total_loss'] = sum(jax.tree_util.tree_leaves(losses))
        metrics['grad_norm'] = optax.global_norm(grads)
        new_ema = state.ema_params
        if new_ema is not None:
            d = jnp.minimum(train_cfg.ema_decay,
                            (1.0 + state.step) / (10.0 + state.step))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d), new_ema, new_params)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt, ema_params=new_ema)
        return new_state, new_tstate, metrics

    return train_step
