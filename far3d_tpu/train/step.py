"""Jitted train / inference step factories.

The reference's IterBasedRunner + Fp16OptimizerHook + DDP loop
(core/apis/mmdet_train.py:31-204) collapses into one pure function:

  train_step(state, temporal, batch, rng) -> (state, temporal, metrics)

Batch lanes are sharded over the `data` mesh axis (parallel/mesh.py);
gradient all-reduce is inserted by XLA. The temporal memory is threaded
through as donated carry so streams recur on-device.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..config import Far3DConfig
from ..models.detector import Far3D
from ..models.farhead import TemporalState, init_state
from ..models.heads2d import make_priors
from ..ops.grid_mask import grid_mask
from .dn import build_dn_queries
from .losses2d import yolox_loss
from .losses3d import farhead_loss
from .optim import make_optimizer


class TrainBatch(flax.struct.PyTreeNode):
    """One training frame per batch lane (collate of the reference's
    Collect3D keys, far3d.py:186-187). All GT padded to static budgets."""
    images: jax.Array          # (B, N, H, W, 3) normalized
    lidar2img: jax.Array       # (B, N, 4, 4)
    intrinsics: jax.Array      # (B, N, 4, 4)
    extrinsics: jax.Array      # (B, N, 4, 4)
    timestamp: jax.Array       # (B,)
    prev_exists: jax.Array     # (B,)
    ego_pose: jax.Array        # (B, 4, 4)
    ego_pose_inv: jax.Array    # (B, 4, 4)
    gt_boxes: jax.Array        # (B, G, 7) metric gravity-center boxes
    gt_velocity: jax.Array     # (B, G, 2) vx, vy (zeros for AV2; nuScenes
                               # models with 10-dim codes append these)
    gt_labels: jax.Array       # (B, G)
    gt_mask: jax.Array         # (B, G)
    gt_boxes2d: jax.Array      # (B, N, G2, 4) xyxy padded pixels
    gt_labels2d: jax.Array     # (B, N, G2)
    gt_centers2d: jax.Array    # (B, N, G2, 2)
    gt_mask2d: jax.Array       # (B, N, G2)
    gt_depth_bins: jax.Array   # (B, N, H8*W8) int LID bins (overflow=num_bins)
    gt_depth_fg: jax.Array     # (B, N, H8*W8) bool


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    stats: Any                 # frozen-BN running stats
    batch_stats: Any           # YOLOX-head trainable BN stats
    opt_state: Any
    ema_params: Any = None     # EMA shadow of params (cfg.train.ema_decay)


def create_train_state(cfg: Far3DConfig, rng: jax.Array, batch: int
                       ) -> Tuple[TrainState, TemporalState]:
    model = Far3D(cfg)
    h, w = cfg.data.input_hw
    n = cfg.data.num_cams
    eye = jnp.tile(jnp.eye(4)[None, None], (batch, n, 1, 1))
    tstate = init_state(batch, cfg.head)
    variables = jax.jit(model.init, static_argnames=('train',))(
        rng,
        images=jnp.zeros((batch, n, h, w, 3)),
        lidar2img=eye, intrinsics=eye, extrinsics=eye, state=tstate,
        prev_exists=jnp.zeros((batch,)), timestamp=jnp.zeros((batch,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (batch, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (batch, 1, 1)))
    params = variables['params']
    tx = make_optimizer(cfg.train, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        stats=variables.get('stats', {}),
        batch_stats=variables.get('batch_stats', {}),
        opt_state=tx.init(params),
        ema_params=params if cfg.train.ema_decay > 0 else None), tstate


def make_train_step(cfg: Far3DConfig, use_gt_depth: bool = True):
    """Returns a jittable train_step(state, tstate, batch, rng)."""
    model = Far3D(cfg)
    tx = None  # built lazily against param structure

    def train_step(state: TrainState, tstate: TemporalState,
                   batch: TrainBatch, rng: jax.Array):
        nonlocal tx
        rng_gm, rng_dn, rng_drop = jax.random.split(
            jax.random.fold_in(rng, state.step), 3)
        images = batch.images
        if jnp.issubdtype(images.dtype, jnp.integer):
            # uint8 transport: normalize BEFORE grid-mask so masked cells are
            # 0.0 post-normalize, matching the reference (GridMask runs on
            # the normalized image, far3d.py grid_mask usage)
            mean = jnp.asarray(cfg.data.img_mean, jnp.float32)
            std = jnp.asarray(cfg.data.img_std, jnp.float32)
            images = (images.astype(jnp.float32) - mean) / std
        if cfg.train.use_grid_mask:
            images = grid_mask(rng_gm, images, cfg.train.grid_mask_prob)
        # bf16 compute (the reference trains fp16 AMP; params stay f32)
        if cfg.train.dtype == 'bfloat16':
            images = images.astype(jnp.bfloat16)

        dn = None
        if cfg.head.with_dn:
            dn = build_dn_queries(rng_dn, batch.gt_boxes, batch.gt_labels,
                                  batch.gt_mask, cfg.head, cfg.pc_range)

        b, n = batch.images.shape[:2]
        from ..models.detector import level_shapes
        priors = make_priors(level_shapes(cfg), cfg.strides)

        def loss_fn(params):
            variables = {'params': params, 'stats': state.stats,
                         'batch_stats': state.batch_stats}
            out, mutated = model.apply(
                variables, images=images, lidar2img=batch.lidar2img,
                intrinsics=batch.intrinsics, extrinsics=batch.extrinsics,
                state=tstate, prev_exists=batch.prev_exists,
                timestamp=batch.timestamp, ego_pose=batch.ego_pose,
                ego_pose_inv=batch.ego_pose_inv,
                gt_depth_bins=batch.gt_depth_bins,
                dn_ref_points=None if dn is None else dn['ref_points'],
                dn_valid=None if dn is None else dn['valid'],
                use_gt_depth=use_gt_depth, train=True,
                rngs={'dropout': rng_drop}, mutable=['batch_stats'])
            losses = farhead_loss(out, batch.gt_boxes, batch.gt_labels,
                                  batch.gt_mask, dn, cfg.head)
            losses.update(yolox_loss(
                out['outs2d'], priors,
                batch.gt_boxes2d.reshape(b * n, *batch.gt_boxes2d.shape[2:]),
                batch.gt_labels2d.reshape(b * n, -1),
                batch.gt_centers2d.reshape(b * n, -1, 2),
                batch.gt_mask2d.reshape(b * n, -1),
                batch.gt_depth_bins.reshape(b * n, -1),
                batch.gt_depth_fg.reshape(b * n, -1), cfg.roi2d))
            total = sum(jax.tree_util.tree_leaves(losses))
            return total, (losses, out['state'], mutated['batch_stats'])

        grads, (losses, new_tstate, new_bs) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        if tx is None:
            tx = make_optimizer(cfg.train, state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics['total_loss'] = sum(jax.tree_util.tree_leaves(losses))
        metrics['grad_norm'] = optax.global_norm(grads)
        new_ema = state.ema_params
        if new_ema is not None:
            # decay warmup ramp (torch ExponentialMovingAverage convention)
            d = jnp.minimum(cfg.train.ema_decay,
                            (1.0 + state.step) / (10.0 + state.step))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d), new_ema, new_params)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt,
                                  ema_params=new_ema)
        return new_state, new_tstate, metrics

    return train_step


def make_infer_step(cfg: Far3DConfig):
    """Streaming inference step (reference: simple_test_pts far3d.py:244-266):
    (variables, tstate, batch) -> (detections, tstate)."""
    from ..models.detector import decode_detections
    model = Far3D(cfg)

    def infer_step(variables, tstate: TemporalState, batch: Dict[str, Any],
                   quant_tree=None):
        out = model.apply(
            variables, images=batch['images'], lidar2img=batch['lidar2img'],
            intrinsics=batch['intrinsics'], extrinsics=batch['extrinsics'],
            state=tstate, prev_exists=batch['prev_exists'],
            timestamp=batch['timestamp'], ego_pose=batch['ego_pose'],
            ego_pose_inv=batch['ego_pose_inv'], train=False,
            quant_backbone=quant_tree)
        dets = decode_detections(out['all_cls_scores'][-1],
                                 out['all_bbox_preds'][-1],
                                 out['query_valid'], cfg)
        return dets, out['state']

    return infer_step
