"""Data layer tests: dataset geometry, pipeline shapes, stream sampler."""

import os
import pickle

import numpy as np
import pytest

from far3d_tpu.config import tiny_test_config
from far3d_tpu.data.av2_dataset import AV2SequenceDataset
from far3d_tpu.data.pipeline import process_frame
from far3d_tpu.data.sampler import EvalShardSampler, InfiniteGroupStreamSampler


def make_fake_infos(path, n_scenes=2, frames_per_scene=6, n_cams=2):
    rng = np.random.RandomState(0)
    infos = []
    for s in range(n_scenes):
        for f in range(frames_per_scene):
            ego = np.eye(4)
            ego[:3, 3] = [f * 2.0, s, 0]
            cam_infos = {}
            for c in range(n_cams):
                intr = np.array([[400.0, 0, 480], [0, 400.0, 320],
                                 [0, 0, 1.0]])
                ego_cam = np.eye(4)
                ego_cam[:3, 3] = [1.0, 0, 1.5]
                cam_infos[f'cam{c}'] = dict(
                    fpath=f'scene{s}/cam{c}/{f}.jpg',
                    intrinsics=intr,
                    ego_SE3_cam=ego_cam,
                    city_SE3_ego_cam_t=ego,
                    cam_timestamp_ns=f * int(1e8),
                )
            m = 5
            boxes = np.concatenate([
                rng.uniform(-30, 30, (m, 2)), rng.uniform(0, 2, (m, 1)),
                rng.uniform(1, 4, (m, 3)), rng.uniform(-3, 3, (m, 1))], axis=1)
            infos.append(dict(
                scene_id=f'scene{s}',
                lidar_timestamp_ns=f * int(1e8),
                city_SE3_ego_lidar_t=ego,
                cam_infos=cam_infos,
                gt3d_infos=dict(
                    gt_boxes=boxes.astype(np.float32),
                    gt_names=np.array(['REGULAR_VEHICLE'] * m),
                    num_interior_pts=np.array([3, 0, 5, 2, 1]),
                ),
                gt2d_infos=dict(
                    gt_2dbboxes=[np.array([[100., 100, 300, 400]],
                                          np.float32)] * n_cams,
                    gt_2dlabels=[np.array([15])] * n_cams,
                    centers2d=[np.array([[200., 250]], np.float32)] * n_cams,
                    depths=[np.array([20.0], np.float32)] * n_cams,
                ),
            ))
    with open(path, 'wb') as f:
        pickle.dump({'infos': infos}, f)


@pytest.fixture(scope='module')
def dataset(tmp_path_factory):
    p = tmp_path_factory.mktemp('data') / 'infos.pkl'
    make_fake_infos(p)
    return AV2SequenceDataset(str(p), data_root='/nonexistent',
                              seq_split_num=2)


def test_dataset_groups_and_prev_exists(dataset):
    assert len(dataset) == 12
    # 2 scenes x seq_split_num 2 = 4 groups of 3
    assert len(np.unique(dataset.flag)) == 4
    rec0 = dataset.get_frame(0)
    rec1 = dataset.get_frame(1)
    rec3 = dataset.get_frame(3)   # start of sub-split
    assert rec0['prev_exists'] == 0.0
    assert rec1['prev_exists'] == 1.0
    assert rec3['prev_exists'] == 0.0
    # gt filtered by num_interior_pts > 0 (argoverse2_dataset.py:201)
    assert rec0['gt_boxes_3d'].shape[0] == 4
    # lidar2img = intrinsics @ extrinsics
    np.testing.assert_allclose(
        rec0['lidar2img'],
        np.einsum('nij,njk->nik', rec0['intrinsics'], rec0['extrinsics']),
        rtol=1e-5)


def test_pipeline_shapes(dataset):
    cfg = tiny_test_config()
    rec = dataset.get_frame(0)
    rng = np.random.default_rng(0)
    # one landscape + one portrait (front-camera path) image
    images = [np.random.rand(128, 192, 3).astype(np.float32) * 255,
              np.random.rand(192, 128, 3).astype(np.float32) * 255]
    out = process_frame(rec, cfg, rng, train=True, images=images)
    h, w = cfg.data.input_hw
    assert out['images'].shape == (2, h, w, 3)
    assert out['gt_boxes'].shape == (cfg.data.max_gt, 7)
    pcr = np.asarray(cfg.pc_range)
    b3 = rec['gt_boxes_3d']
    expect = int(((b3[:, 0] >= pcr[0]) & (b3[:, 0] <= pcr[3]) &
                  (b3[:, 1] >= pcr[1]) & (b3[:, 1] <= pcr[4])).sum())
    assert out['gt_mask'].sum() == expect
    assert out['gt_depth_bins'].shape == (
        2, (h // cfg.depthnet.stride) * (w // cfg.depthnet.stride))
    # intrinsics got the ida update => lidar2img changed vs raw
    assert not np.allclose(out['lidar2img'], rec['lidar2img'])


def test_stream_sampler_preserves_scene_order(dataset):
    s = InfiniteGroupStreamSampler(dataset.flag, batch_size=2, seed=1)
    it = iter(s)
    lanes = [[], []]
    for _ in range(9):
        b = next(it)
        for lane in range(2):
            lanes[lane].append(b[lane])
    for lane_hist in lanes:
        flags = dataset.flag[lane_hist]
        # within a group visit, indices are consecutive ascending
        for i in range(1, len(lane_hist)):
            if flags[i] == flags[i - 1]:
                assert lane_hist[i] == lane_hist[i - 1] + 1
        # a group is fully consumed before switching
        changes = np.where(np.diff(flags) != 0)[0]
        for c in changes:
            grp = flags[c]
            grp_len = (dataset.flag == grp).sum()
            start = c
            while start > 0 and flags[start - 1] == grp:
                start -= 1
            assert c - start + 1 == grp_len


def test_eval_shard_sampler():
    s0 = EvalShardSampler(10, rank=0, world_size=3)
    s1 = EvalShardSampler(10, rank=1, world_size=3)
    s2 = EvalShardSampler(10, rank=2, world_size=3)
    assert list(s0) == [0, 1, 2, 3]
    assert list(s1) == [4, 5, 6, 7]
    assert list(s2) == [8, 9, 9, 9] and s2.pad == 2


def test_epoch_group_sampler():
    """DistributedGroupSampler semantics (group_sampler.py:21-116): every
    batch-chunk is group-pure, ranks partition one shared permutation, all
    real indices are covered, and reshuffling is epoch-deterministic."""
    from far3d_tpu.data.sampler import EpochGroupSampler

    flags = np.asarray([0] * 5 + [1] * 3 + [2] * 7)   # ragged group sizes
    bs, world = 2, 2
    samplers = [EpochGroupSampler(flags, bs, rank=r, world_size=world, seed=3)
                for r in range(world)]
    per_rank = [list(s) for s in samplers]
    n = samplers[0].num_samples
    assert all(len(ix) == n for ix in per_rank)
    # chunks of batch_size are group-pure on every rank
    for ix in per_rank:
        for i in range(0, n, bs):
            assert len(set(flags[ix[i:i + bs]])) == 1
    # union covers every real index (padding repeats, never drops)
    assert set(per_rank[0]) | set(per_rank[1]) == set(range(len(flags)))
    # deterministic per epoch; different across epochs
    assert list(samplers[0]) == per_rank[0]
    samplers[0].set_epoch(1)
    assert list(samplers[0]) != per_rank[0]


def test_warp_pipeline_matches_resize_crop():
    """The single-pass warpAffine resampling must reproduce the reference's
    float-resize-then-crop chain (custom_pipeline.py:71-111) to uint8
    interpolation rounding."""
    import cv2

    from far3d_tpu.data.pipeline import _pix_map

    rng = np.random.RandomState(3)
    h, w, resize = 310, 410, 0.51         # deliberately non-reciprocal scale
    img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
    dims = (int(w * resize), int(h * resize))
    fh, fw = 96, 160
    crop = ((dims[0] - fw) // 2, dims[1] - fh,
            (dims[0] - fw) // 2 + fw, dims[1])
    ref = cv2.resize(img.astype(np.float32), dims,
                     interpolation=cv2.INTER_LINEAR)
    ref = ref[crop[1]:crop[3], crop[0]:crop[2]]
    m = _pix_map((h, w), dims, crop)
    got = cv2.warpAffine(img, m[:2], (fw, fh),
                         flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    assert np.abs(ref - got.astype(np.float32)).max() <= 1.0
