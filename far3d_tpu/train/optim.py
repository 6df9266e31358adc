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


def make_layerwise_decay_labels(params: Any, num_layers: int,
                                prefix: str = 'backbone') -> Any:
    """Layer-wise LR decay labels for ViT-style backbones (reference:
    models/utils/layer_decay_optimizer_constructor.py:81-146; unused by the
    shipped config). Returns per-param depth labels 'layer_{i}' usable with
    optax.multi_transform."""
    def label_path(path, _):
        keys = [str(getattr(p, 'key', p)) for p in path]
        if keys[0] != prefix:
            return f'layer_{num_layers}'
        for k in keys:
            if k.startswith('layer') and k[5:].isdigit():
                return f'layer_{min(int(k[5:]), num_layers - 1)}'
            if k.startswith('stage') and '_block' in k:
                return f'layer_{min(int(k[5]) - 2, num_layers - 1)}'
        return 'layer_0'
    return jax.tree_util.tree_map_with_path(label_path, params)


class DynamicLossScale:
    """fp16 dynamic loss scaling (reference: WarmupFp16OptimizerHook,
    models/utils/warmup_fp16_optimizer.py:18-134). Not needed for the default
    bf16 recipe; provided for fp16 experiments.

    Usage: scale loss by `.scale` before grad; call `update(grads_finite)`
    after each step; skip the optimizer update when grads are non-finite."""

    def __init__(self, init_scale: float = 2.0 ** 15, growth_interval: int =
                 2000, factor: float = 2.0):
        self.scale = init_scale
        self.growth_interval = growth_interval
        self.factor = factor
        self._good_steps = 0

    def update(self, grads_finite: bool):
        if grads_finite:
            self._good_steps += 1
            if self._good_steps >= self.growth_interval:
                self.scale *= self.factor
                self._good_steps = 0
        else:
            self.scale = max(self.scale / self.factor, 1.0)
            self._good_steps = 0
        return grads_finite
