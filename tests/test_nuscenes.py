"""NuScenesSequenceDataset on a StreamPETR-style fake info pkl."""

import pickle

import numpy as np

from far3d_tpu.data.nuscenes_dataset import NuScenesSequenceDataset


def make_fake_nusc(path, n_frames=4, n_cams=2):
    rng = np.random.RandomState(0)
    infos = []
    for i in range(n_frames):
        cams = {}
        for c in range(n_cams):
            cams[f'CAM_{c}'] = dict(
                data_path=f'samples/CAM_{c}/{i}.jpg',
                cam_intrinsic=np.array([[1000., 0, 800], [0, 1000., 450],
                                        [0, 0, 1]]),
                sensor2lidar_rotation=np.eye(3),
                sensor2lidar_translation=np.array([1.0, 0, 1.5]),
            )
        infos.append(dict(
            scene_token='scene0' if i < 2 else 'scene1',
            timestamp=i * 500000,
            lidar2ego_rotation=np.array([1.0, 0, 0, 0]),   # wxyz quat
            lidar2ego_translation=np.zeros(3),
            ego2global_rotation=np.array([1.0, 0, 0, 0]),
            ego2global_translation=np.array([i * 5.0, 0, 0]),
            cams=cams,
            gt_boxes=rng.uniform(-30, 30, (3, 7)).astype(np.float32),
            gt_names=np.array(['car', 'truck', 'unknown_thing']),
            valid_flag=np.array([True, True, True]),
        ))
    with open(path, 'wb') as f:
        pickle.dump({'infos': infos}, f)


def test_nuscenes_dataset(tmp_path):
    p = tmp_path / 'nusc.pkl'
    make_fake_nusc(p)
    ds = NuScenesSequenceDataset(str(p), data_root='/data/nusc')
    assert len(ds) == 4
    assert len(np.unique(ds.flag)) == 2
    rec = ds.get_frame(0)
    assert rec['prev_exists'] == 0.0
    assert ds.get_frame(1)['prev_exists'] == 1.0
    assert ds.get_frame(2)['prev_exists'] == 0.0   # scene change
    assert rec['lidar2img'].shape == (2, 4, 4)
    # unknown class filtered
    assert rec['gt_boxes_3d'].shape[0] == 2
    # ego pose carries the translation
    np.testing.assert_allclose(ds.get_frame(2)['ego_pose'][:3, 3],
                               [10.0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(
        rec['lidar2img'][0],
        rec['intrinsics'][0] @ rec['extrinsics'][0], rtol=1e-5)
