"""HD-map ROI producer (eval/map_roi.py) against a hand-built synthetic
log_map_archive: rasterization bounds, the 5 m L2 dilation iso-contour,
the ego->city sweep transform, lazy per-log loading, and the metric-layer
gating effect (reference producer: av2_eval_util.py:158-318)."""

import json
import os

import numpy as np

from far3d_tpu.eval.av2_metrics import DetectionConfig, evaluate_detections
from far3d_tpu.eval.map_roi import (LazyROIMasks, SweepROI, build_roi_masks,
                                    load_drivable_polygons, rasterize_roi)


def write_map_archive(map_dir, polygons, log_id='LOG0'):
    os.makedirs(map_dir, exist_ok=True)
    data = {'drivable_areas': {
        str(i): {'id': i,
                 'area_boundary': [{'x': float(x), 'y': float(y), 'z': 0.0}
                                   for x, y in poly]}
        for i, poly in enumerate(polygons)}}
    path = os.path.join(map_dir, f'log_map_archive_{log_id}.json')
    with open(path, 'w') as f:
        json.dump(data, f)
    return path


SQUARE = [(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0)]


def test_load_and_rasterize(tmp_path):
    write_map_archive(str(tmp_path / 'map'), [SQUARE])
    polys = load_drivable_polygons(str(tmp_path / 'map'))
    assert len(polys) == 1 and polys[0].shape == (4, 2)

    roi = rasterize_roi(polys)
    assert roi.resolution_m == 0.1
    # interior
    assert roi.contains(np.array([[10.0, 10.0]]))[0]
    # 5 m dilation: 3 m past the edge in, 6 m past out
    assert roi.contains(np.array([[23.0, 10.0]]))[0]
    assert not roi.contains(np.array([[26.0, 10.0]]))[0]
    # L2 (not chebyshev) dilation at the corner: diag 4.2 m in, 5.7 m out
    assert roi.contains(np.array([[-3.0, -3.0]]))[0]
    assert not roi.contains(np.array([[-4.0, -4.0]]))[0]
    # outside the raster bounds entirely
    assert not roi.contains(np.array([[500.0, 500.0]]))[0]


def test_sweep_roi_applies_ego_pose(tmp_path):
    write_map_archive(str(tmp_path / 'map'), [SQUARE])
    roi = rasterize_roi(load_drivable_polygons(str(tmp_path / 'map')))
    # ego at city (40, 10) facing +y (90 deg yaw): ego +x -> city +y
    mat = np.eye(4)
    c, s = np.cos(np.pi / 2), np.sin(np.pi / 2)
    mat[:2, :2] = [[c, -s], [s, c]]
    mat[:2, 3] = [40.0, 10.0]
    sweep = SweepROI(roi, mat)
    # ego-frame (0, 25): city = (40 - 25, 10) = (15, 10) -> inside
    assert sweep.contains(np.array([[0.0, 25.0]]))[0]
    # ego-frame (25, 0): city = (40, 35) -> far outside
    assert not sweep.contains(np.array([[25.0, 0.0]]))[0]


def test_lazy_masks_and_builder(tmp_path):
    root = tmp_path / 'sensor'
    write_map_archive(str(root / 'val' / 'LOG0' / 'map'), [SQUARE],
                      log_id='LOG0')

    class FakeDataset:
        infos = [dict(scene_id='LOG0', lidar_timestamp_ns=7,
                      city_SE3_ego_lidar_t=np.eye(4))]

        def __len__(self):
            return 1

    masks = build_roi_masks(FakeDataset(), str(root))
    assert masks is not None
    sweep = masks.get(('LOG0', 7))
    assert sweep is not None and sweep.contains(np.array([[5.0, 5.0]]))[0]
    # unknown log falls back to None (range-only gating)
    assert masks.get(('LOG1', 7)) is None
    # LRU caches the rasterized log
    assert 'LOG0' in masks._cache


def test_roi_gates_the_metric(tmp_path):
    """A detection/GT pair far outside the drivable ROI must not count;
    the same pair inside must (av2_metrics.py:119-129)."""
    write_map_archive(str(tmp_path / 'map'), [SQUARE])
    roi = rasterize_roi(load_drivable_polygons(str(tmp_path / 'map')))
    sweep = SweepROI(roi, np.eye(4))

    def box(x, y):
        return [x, y, 1.0, 2.0, 2.0, 2.0, 0.0]

    dets = [dict(log_id='LOG0', timestamp_ns=1,
                 boxes=np.array([box(10, 10), box(60, 60)], np.float32),
                 scores=np.array([0.9, 0.9], np.float32),
                 labels=np.array([0, 0]))]
    anns = [dict(log_id='LOG0', timestamp_ns=1,
                 boxes=np.array([box(10, 10), box(60, 60)], np.float32),
                 labels=np.array([0, 0]),
                 num_interior_pts=np.array([5, 5]))]
    cfg = DetectionConfig(categories=('ARTICULATED_BUS',))
    s_roi, means_roi = evaluate_detections(dets, anns, cfg, workers=0,
                                           roi_masks={('LOG0', 1): sweep})
    s_all, means_all = evaluate_detections(dets, anns, cfg, workers=0)
    # the gate drops the out-of-ROI GT/detection pair from the denominators
    assert s_roi['ARTICULATED_BUS']['num_gts'] == 1
    assert s_all['ARTICULATED_BUS']['num_gts'] == 2
    assert means_roi['mAP'] > 0.9 and means_all['mAP'] > 0.9
