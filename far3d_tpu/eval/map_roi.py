"""Devkit-free HD-map ROI producer for the official AV2 eval protocol.

The reference evaluates with a per-log region-of-interest mask rasterized
from the HD map's drivable areas (av2_eval_util.py:158-318
`ArgoverseStaticMapRemote.from_map_dir_remote(build_raster=True)` ->
`DrivableAreaMapLayer.from_vector_data` + `RoiMapLayer.from_drivable_area_layer`
in the av2 devkit). This module reimplements that producer without the
devkit:

  * `log_map_archive_{log_id}.json` -> drivable-area boundary polygons
    (city frame),
  * rasterize at the devkit's 10 px/m (0.1 m cells) with cv2.fillPoly,
  * ROI = drivable area dilated by the 5 m L2 iso-contour
    (devkit `ROI_ISOCONTOUR = 5.0`, `dilate_by_l2` = euclidean distance
    transform of the complement <= 5 m),
  * per-sweep gating: detections/GT are in the ego frame, the raster is in
    the city frame — `SweepROI` applies city_SE3_ego before the lookup
    (devkit accumulate transforms cuboids into the city frame first).

Maps are loaded lazily with a small per-log LRU: eval streams are grouped by
scene, so only a handful of logs are live at once (a full AV2 val split's
rasters would be several GB if materialized eagerly like the reference
does).
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .av2_metrics import RasterROI

ROI_ISOCONTOUR_M = 5.0      # devkit ROI_ISOCONTOUR
RASTER_RES_M = 0.1          # devkit array_s = 10 px/m


def load_drivable_polygons(map_dir: str) -> List[np.ndarray]:
    """Read `log_map_archive_*.json` in `map_dir` -> list of (N, 2) city-xy
    boundary polygons (schema: drivable_areas[id].area_boundary[*].{x,y,z})."""
    names = sorted(f for f in os.listdir(map_dir)
                   if f.startswith('log_map_archive_') and f.endswith('.json'))
    if len(names) != 1:
        raise FileNotFoundError(
            f'expected exactly one log_map_archive_*.json in {map_dir}, '
            f'found {names}')
    with open(os.path.join(map_dir, names[0])) as f:
        data = json.load(f)
    polys = []
    for da in data.get('drivable_areas', {}).values():
        pts = np.asarray([[p['x'], p['y']] for p in da['area_boundary']],
                         np.float64)
        if len(pts) >= 3:
            polys.append(pts)
    return polys


def rasterize_roi(polygons: Sequence[np.ndarray],
                  resolution_m: float = RASTER_RES_M,
                  dilate_m: float = ROI_ISOCONTOUR_M) -> RasterROI:
    """Drivable-area polygons -> dilated ROI raster (city frame).

    Mirrors DrivableAreaMapLayer.from_vector_data (integer meter bounds,
    fillPoly on rounded pixel coords) + RoiMapLayer's L2 dilation, except the
    raster is padded by `dilate_m` on every side so the ROI is the true 5 m
    iso-contour even at the drivable bounding box's edge (a raster clipped at
    the bbox would silently truncate the dilation there).
    """
    import cv2
    from scipy import ndimage

    if not polygons:
        raise ValueError('no drivable areas in map archive')
    allp = np.concatenate(polygons, axis=0)
    pad = float(np.ceil(dilate_m))
    x_min, y_min = np.floor(allp.min(axis=0)) - pad
    x_max, y_max = np.ceil(allp.max(axis=0)) + pad
    s = 1.0 / resolution_m
    w = int((x_max - x_min + 1) * s)
    h = int((y_max - y_min + 1) * s)
    grid = np.zeros((h, w), np.uint8)
    for poly in polygons:
        px = np.round((poly - (x_min, y_min)) * s).astype(np.int32)
        cv2.fillPoly(grid, [px], 1)
    if dilate_m > 0:
        dist = ndimage.distance_transform_edt(grid == 0,
                                              sampling=resolution_m)
        grid = (dist <= dilate_m).astype(np.uint8)
    return RasterROI(grid=grid.astype(bool), origin_xy=(float(x_min),
                                                        float(y_min)),
                     resolution_m=resolution_m)


class SweepROI:
    """City-frame raster + this sweep's city_SE3_ego: `contains` takes
    ego-frame xy (the metric layer's convention, av2_metrics.py:119-129)."""

    def __init__(self, city_roi: RasterROI, city_se3_ego: np.ndarray):
        self.city_roi = city_roi
        self.mat = np.asarray(city_se3_ego, np.float64)

    def contains(self, xy: np.ndarray) -> np.ndarray:
        xy = np.asarray(xy, np.float64).reshape(-1, 2)
        # ground-plane approximation: cuboid centers at z=0 in the ego frame
        # (the raster query only consumes city xy)
        pts = np.concatenate([xy, np.zeros((len(xy), 1)),
                              np.ones((len(xy), 1))], axis=1)
        city = pts @ self.mat.T
        return self.city_roi.contains(city[:, :2])


class LazyROIMasks:
    """{(log_id, timestamp_ns) -> SweepROI} with an LRU of per-log rasters.

    `poses`: {(log_id, timestamp_ns): city_SE3_ego (4, 4)}.
    `map_dirs`: {log_id: path to the log's map/ directory}.
    """

    def __init__(self, map_dirs: Dict[str, str],
                 poses: Dict[Tuple[str, int], np.ndarray],
                 max_logs: int = 4,
                 resolution_m: float = RASTER_RES_M):
        self.map_dirs = map_dirs
        self.poses = poses
        self.max_logs = max_logs
        self.resolution_m = resolution_m
        self._cache: 'OrderedDict[str, RasterROI]' = OrderedDict()

    def _log_roi(self, log_id: str) -> Optional[RasterROI]:
        if log_id in self._cache:
            self._cache.move_to_end(log_id)
            return self._cache[log_id]
        map_dir = self.map_dirs.get(log_id)
        if map_dir is None:
            return None
        roi = rasterize_roi(load_drivable_polygons(map_dir),
                            resolution_m=self.resolution_m)
        self._cache[log_id] = roi
        while len(self._cache) > self.max_logs:
            self._cache.popitem(last=False)
        return roi

    def get(self, key, default=None):
        if isinstance(key, tuple):
            log_id, ts = key
        else:
            log_id, ts = key, None
        pose = self.poses.get((log_id, ts))
        if pose is None:
            return default
        roi = self._log_roi(log_id)
        if roi is None:
            return default
        return SweepROI(roi, pose)


def build_roi_masks(dataset, data_root: str,
                    max_logs: int = 4) -> Optional[LazyROIMasks]:
    """Wire a dataset's infos to the per-log map directories.

    AV2 layout: {data_root}/{split}/{log_id}/map/log_map_archive_*.json.
    Logs without a map directory fall back to range-only gating (None ROI).
    """
    map_dirs: Dict[str, str] = {}
    poses: Dict[Tuple[str, int], np.ndarray] = {}
    for i in range(len(dataset)):
        info = dataset.infos[i]
        log_id = info['scene_id']
        ts = int(info['lidar_timestamp_ns'])
        poses[(log_id, ts)] = np.asarray(info['city_SE3_ego_lidar_t'],
                                         np.float64)
        if log_id not in map_dirs:
            for split_dir in ('', 'train', 'val', 'test'):
                cand = os.path.join(data_root, split_dir, log_id, 'map')
                if os.path.isdir(cand):
                    map_dirs[log_id] = cand
                    break
    if not map_dirs:
        return None
    return LazyROIMasks(map_dirs, poses, max_logs=max_logs)
