"""StreamPETR-on-nuScenes streaming evaluation.

Closes the loop for the second model family: nuScenes info pkl
(`tools/create_nusc_infos.py`) -> `NuScenesSequenceDataset` -> the shared
threaded `EvalLoader`/host pipeline -> jitted StreamPETR streaming forward
with the explicit temporal carry -> NMS-free decode -> in-house NDS metrics
(`eval/nuscenes_metrics.py`).

The reference runs this path through mmdet3d's NuScenesDataset.evaluate +
the nuscenes devkit (datasets/nuscenes_dataset.py:23); here it is the same
framework machinery the Far3D/AV2 path uses.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DataConfig, Far3DConfig
from ..models.detector import decode_boxes
from ..models.streampetr import StreamPETR, StreamPETRConfig, init_petr_state
from .nuscenes_metrics import (NuScenesDetectionConfig, evaluate_nuscenes,
                               format_nuscenes_summary)


def petr_host_config(cfg: StreamPETRConfig,
                     src_wh: Tuple[int, int] = (1600, 900)) -> Far3DConfig:
    """Far3DConfig shim whose data fields drive the shared host pipeline
    (`data/pipeline.process_frame`) for nuScenes cameras: deterministic
    resize so the source width maps onto the model's input width, bottom
    crop (StreamPETR's nuScenes recipe — the top crop removes sky)."""
    fh, fw = cfg.input_hw
    r = fw / src_wh[0]
    if int(src_wh[1] * r) < fh:
        raise ValueError(f'input_hw {cfg.input_hw} taller than resized '
                         f'source {src_wh} * {r}')
    return Far3DConfig(
        pc_range=cfg.pc_range,
        data=DataConfig(num_cams=cfg.num_cams, input_hw=cfg.input_hw,
                        resize_lim=(r, r), max_gt=160, max_gt_2d=96))


def run_inference_petr(cfg: StreamPETRConfig, variables, loader,
                       quant_tree=None) -> List[Dict]:
    """Stream the loader through a jitted StreamPETR step with the carried
    TemporalState (reset via prev_exists, same recurrence contract as
    Far3D's eval runner).

    quant_tree: optional int8 PTQ backbone (ops/quant.py
    `quantize_petr_backbone`) — serving mode, swaps the bf16 backbone."""
    model = StreamPETR(cfg)
    tstate = init_petr_state(1, cfg)

    @jax.jit
    def step(variables, tstate, kw, quant_tree):
        out = model.apply(variables, images=kw['images'],
                          lidar2img=kw['lidar2img'], state=tstate,
                          prev_exists=kw['prev_exists'],
                          timestamp=kw['timestamp'],
                          ego_pose=kw['ego_pose'],
                          ego_pose_inv=kw['ego_pose_inv'],
                          quant_backbone=quant_tree)
        dets = decode_boxes(out['all_cls_scores'][-1],
                            out['all_bbox_preds'][-1],
                            out['query_valid'], cfg.max_decode_num,
                            cfg.post_center_range)
        return dets, out['state']

    results = []
    for frame in loader:
        kw = {k: jnp.asarray(np.asarray(frame[k])[None])
              for k in ('images', 'lidar2img', 'prev_exists', 'timestamp',
                        'ego_pose', 'ego_pose_inv')}
        dets, tstate = step(variables, tstate, kw, quant_tree)
        valid = np.asarray(dets['valid'][0])
        results.append(dict(
            index=frame['index'],
            boxes=np.asarray(dets['boxes'][0], np.float64)[valid],
            scores=np.asarray(dets['scores'][0], np.float64)[valid],
            labels=np.asarray(dets['labels'][0], np.int64)[valid]))
    return results


def collect_and_evaluate_nusc(dataset, results: List[Dict],
                              cfg: Optional[NuScenesDetectionConfig] = None):
    """Pair per-frame detections with the dataset's GT and run the
    in-house nuScenes protocol. Returns (summary, means)."""
    dts, gts = [], []
    for r in results:
        rec = dataset.get_frame(r['index'])
        token = f"{rec['scene_token']}/{rec['lidar_timestamp']}"
        dts.append(dict(sample_token=token, boxes=r['boxes'],
                        scores=r['scores'], labels=r['labels']))
        g = np.asarray(rec.get('gt_boxes_3d', np.zeros((0, 7))), np.float64)
        vel = np.asarray(rec.get('gt_velocity', np.zeros((len(g), 2))),
                         np.float64)
        gt = dict(sample_token=token,
                  boxes=np.concatenate([g, vel], axis=1),
                  labels=np.asarray(rec.get('gt_labels_3d', np.zeros(0)),
                                    np.int64))
        if 'gt_attrs' in rec:      # real annotation attributes (AAE)
            gt['attrs'] = np.asarray(rec['gt_attrs'], np.int64)
        gts.append(gt)
    summary, means = evaluate_nuscenes(dts, gts, cfg)
    print(format_nuscenes_summary(summary, means))
    return summary, means
