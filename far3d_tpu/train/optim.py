"""Optimizer & LR schedule (reference: far3d.py:260-276 + mmcv hooks).

AdamW lr 2e-4 (x0.1 for the backbone, paramwise_cfg far3d.py:263-266), weight
decay 0.01, global-norm grad clip 35 (far3d.py:268), linear warmup 500 iters
from lr/3 then cosine annealing to lr*1e-3 (far3d.py:270-276).

The reference trains fp16 with a dynamic loss scaler (WarmupFp16OptimizerHook);
on TPU we train bf16 compute + f32 params, which needs no loss scaling.

`pseudo_reference_points` is frozen (farhead.py:438): its updates are zeroed.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig


def lr_schedule(cfg: TrainConfig):
    warmup = optax.linear_schedule(
        init_value=cfg.lr * cfg.warmup_ratio, end_value=cfg.lr,
        transition_steps=cfg.warmup_iters)
    cosine = optax.cosine_decay_schedule(
        init_value=cfg.lr, decay_steps=max(cfg.total_iters - cfg.warmup_iters, 1),
        alpha=cfg.min_lr_ratio)
    return optax.join_schedules([warmup, cosine], [cfg.warmup_iters])


def _label_params(params: Any) -> Any:
    """Label each param: 'frozen' (pseudo ref pts), 'backbone', or 'main'."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_path(path):
        keys = [getattr(p, 'key', str(p)) for p in path]
        if any('pseudo_reference_points' in str(k) for k in keys):
            return 'frozen'
        if str(keys[0]) == 'backbone':
            return 'backbone'
        return 'main'

    return jax.tree_util.tree_map_with_path(
        lambda path, _: label_path(path), params)


def make_optimizer(cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    sched = lr_schedule(cfg)

    def adamw(lr_mult: float):
        return optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_learning_rate(
                lambda step: sched(step) * lr_mult))

    tx = optax.multi_transform(
        {'main': adamw(1.0), 'backbone': adamw(cfg.backbone_lr_mult),
         'frozen': optax.set_to_zero()},
        _label_params(params))
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
