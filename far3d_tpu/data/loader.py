"""Threaded host data loader (replaces the reference's torch DataLoader worker
processes + mmcv collate, datasets/builder.py:23-118).

A pool of worker threads runs the host pipeline (JPEG decode via cv2 releases
the GIL) and a bounded queue prefetches batches ahead of the jitted step, so
host IO overlaps device compute. Batches come out as TrainBatch pytrees of
stacked numpy arrays — static shapes, ready for device_put with the `data`
axis sharding.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np

from ..config import Far3DConfig
from .av2_dataset import AV2SequenceDataset
from .pipeline import process_frame
from .sampler import EvalShardSampler, InfiniteGroupStreamSampler


def _stack_batch(frames, train: bool):
    from ..train.step import TrainBatch
    keys = ['images', 'lidar2img', 'intrinsics', 'extrinsics', 'timestamp',
            'prev_exists', 'ego_pose', 'ego_pose_inv']
    if train:
        keys += ['gt_boxes', 'gt_velocity', 'gt_labels', 'gt_mask', 'gt_boxes2d',
                 'gt_labels2d', 'gt_centers2d', 'gt_mask2d', 'gt_depth_bins',
                 'gt_depth_fg']
        return TrainBatch(**{k: np.stack([f[k] for f in frames]) for k in keys})
    return {k: np.stack([f[k] for f in frames]) for k in keys}


class TrainLoader:
    """Infinite stream-preserving training loader."""

    def __init__(self, dataset: AV2SequenceDataset, cfg: Far3DConfig,
                 batch_size: int, rank: int = 0, world_size: int = 1,
                 seed: int = 0, prefetch: int = 4, num_threads: int = 8):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.sampler = InfiniteGroupStreamSampler(
            dataset.flag, batch_size, rank, world_size, seed)
        self._rngs = [np.random.default_rng(seed * 7919 + rank * batch_size + i)
                      for i in range(batch_size)]
        self._queue: 'queue.Queue' = queue.Queue(maxsize=prefetch)
        self._pool = ThreadPoolExecutor(max_workers=num_threads)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _load_one(self, lane: int, idx: int) -> Dict:
        rec = self.dataset.get_frame(idx)
        return process_frame(rec, self.cfg, self._rngs[lane], train=True)

    def _producer(self):
        for indices in self.sampler:
            if self._stop.is_set():
                return
            futs = [self._pool.submit(self._load_one, lane, idx)
                    for lane, idx in enumerate(indices)]
            frames = [f.result() for f in futs]
            self._queue.put(_stack_batch(frames, train=True))

    def __iter__(self) -> Iterator:
        while True:
            yield self._queue.get()

    def stop(self):
        self._stop.set()


class EvalLoader:
    """Sequential streaming eval loader for one rank's contiguous shard
    (reference: custom_multi_gpu_test, core/apis/test.py:45-113)."""

    def __init__(self, dataset: AV2SequenceDataset, cfg: Far3DConfig,
                 rank: int = 0, world_size: int = 1, prefetch: int = 8,
                 num_threads: int = 8, max_frames=None):
        self.dataset = dataset
        self.cfg = cfg
        self.sampler = EvalShardSampler(len(dataset), rank, world_size)
        n = len(self.sampler)
        self._limit = n if max_frames is None else min(max_frames, n)
        # padded tail repeats only survive a cap that reaches into them
        self.pad = max(0, self.sampler.pad - (n - self._limit))
        self._prefetch = prefetch
        self._num_threads = num_threads

    def __len__(self):
        return self._limit

    def __iter__(self):
        pool = ThreadPoolExecutor(max_workers=self._num_threads)
        indices = list(self.sampler)[:self._limit]

        def load(idx):
            rec = self.dataset.get_frame(idx)
            out = process_frame(rec, self.cfg, np.random.default_rng(0),
                                train=False)
            out['index'] = idx
            return out

        futs = [pool.submit(load, i) for i in indices[:self._prefetch]]
        k = self._prefetch
        for i in range(len(indices)):
            frame = futs[i % self._prefetch].result()
            if k < len(indices):
                futs[k % self._prefetch] = pool.submit(load, indices[k])
                k += 1
            yield frame
        pool.shutdown(wait=False)
