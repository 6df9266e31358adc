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


def test_devkit_free_converter_roundtrip(tmp_path):
    """tools/create_nusc_infos.py reads raw nuScenes JSON tables (no devkit)
    and its pkl loads through NuScenesSequenceDataset with correct frames,
    boxes and projected 2D annotations (reference:
    tools/data_converter/nuscenes_converter.py)."""
    import json
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tools'))
    from create_nusc_infos import create_nusc_infos
    from far3d_tpu.data.nuscenes_dataset import NuScenesSequenceDataset

    v = tmp_path / 'v1.0-mini'
    v.mkdir()
    ident_q = [1.0, 0.0, 0.0, 0.0]

    def write(name, rows):
        with open(v / f'{name}.json', 'w') as f:
            json.dump(rows, f)

    write('scene', [dict(token='sc0', name='scene-0001', log_token='log0')])
    write('sensor', [
        dict(token='se_lidar', channel='LIDAR_TOP', modality='lidar'),
        dict(token='se_cf', channel='CAM_FRONT', modality='camera'),
        dict(token='se_cb', channel='CAM_BACK', modality='camera')])
    intr = [[800.0, 0.0, 800.0], [0.0, 800.0, 450.0], [0.0, 0.0, 1.0]]
    write('calibrated_sensor', [
        dict(token='cs_lidar', sensor_token='se_lidar', rotation=ident_q,
             translation=[0, 0, 1.8], camera_intrinsic=[]),
        # CAM_FRONT: +x optical axis -> camera frame (z fwd, x right, y down)
        dict(token='cs_cf', sensor_token='se_cf',
             rotation=[0.5, -0.5, 0.5, -0.5], translation=[1.5, 0, 1.5],
             camera_intrinsic=intr),
        dict(token='cs_cb', sensor_token='se_cb',
             rotation=[0.5, 0.5, -0.5, -0.5], translation=[-1.5, 0, 1.5],
             camera_intrinsic=intr)])
    samples, sds, eps = [], [], []
    for i, ts in enumerate([1000000, 1500000]):
        samples.append(dict(token=f's{i}', scene_token='sc0', timestamp=ts,
                            prev='' if i == 0 else f's{i-1}',
                            next='' if i == 1 else f's{i+1}'))
        eps.append(dict(token=f'ep{i}', rotation=ident_q,
                        translation=[2.0 * i, 0, 0], timestamp=ts))
        for ch, cs in (('lidar', 'cs_lidar'), ('cf', 'cs_cf'),
                       ('cb', 'cs_cb')):
            sds.append(dict(
                token=f'sd_{ch}{i}', sample_token=f's{i}',
                calibrated_sensor_token=cs, ego_pose_token=f'ep{i}',
                is_key_frame=True, timestamp=ts,
                filename=f'samples/{ch}/{i}.jpg'))
    write('sample', samples)
    write('sample_data', sds)
    write('ego_pose', eps)
    write('category', [dict(token='cat_car', name='vehicle.car'),
                       dict(token='cat_x', name='static_object.bicycle_rack')])
    write('instance', [dict(token='inst0', category_token='cat_car'),
                       dict(token='inst1', category_token='cat_x')])
    anns = []
    for i in range(2):
        # a car 10 m ahead of the ego, moving 2 m per 0.5 s in +x
        anns.append(dict(
            token=f'a{i}', sample_token=f's{i}', instance_token='inst0',
            translation=[12.0 + 2.0 * i + 2.0 * i, 0.0, 0.9],
            size=[2.0, 4.5, 1.6], rotation=ident_q,
            prev='' if i == 0 else f'a{i-1}',
            next='' if i == 1 else f'a{i+1}', num_lidar_pts=10))
    # an unmapped-category object that must be dropped
    anns.append(dict(token='ax', sample_token='s0', instance_token='inst1',
                     translation=[5, 5, 0.5], size=[1, 1, 1],
                     rotation=ident_q, prev='', next='', num_lidar_pts=3))
    write('sample_annotation', anns)

    infos = create_nusc_infos(tmp_path, 'v1.0-mini', {'scene-0001'})
    assert len(infos) == 2
    assert set(infos[0]['cams']) == {'CAM_FRONT', 'CAM_BACK'}
    assert infos[0]['gt_boxes'].shape == (1, 9)   # unmapped class dropped
    b = infos[0]['gt_boxes'][0]
    # lidar frame: ann at x=12, ego at 0, lidar z offset 1.8
    np.testing.assert_allclose(b[0], 12.0, atol=1e-5)
    np.testing.assert_allclose(b[2], 0.9 - 0.8 - 1.8, atol=1e-5)  # bottom z
    np.testing.assert_allclose(b[3:6], [2.0, 4.5, 1.6], atol=1e-5)
    np.testing.assert_allclose(b[6], -np.pi / 2, atol=1e-5)  # mmdet3d yaw
    # velocity ~ 4 m / 0.5 s
    np.testing.assert_allclose(b[7], 8.0, atol=1e-3)
    # 2D projection: visible in CAM_FRONT, absent in CAM_BACK
    ci = list(infos[0]['cams']).index('CAM_FRONT')
    an = infos[0]['annos']
    assert len(an['bboxes2d'][ci]) == 1
    assert an['depths'][ci][0] > 0
    cb = list(infos[0]['cams']).index('CAM_BACK')
    assert len(an['bboxes2d'][cb]) == 0

    # pkl loads through the dataset reader
    import pickle
    pkl = tmp_path / 'infos.pkl'
    with open(pkl, 'wb') as f:
        pickle.dump({'infos': infos}, f)
    ds = NuScenesSequenceDataset(str(pkl), str(tmp_path))
    assert len(ds) == 2
    rec = ds.get_frame(0)
    assert rec['gt_boxes_3d'].shape == (1, 7)
    # reader converts bottom z -> gravity center z
    np.testing.assert_allclose(rec['gt_boxes_3d'][0, 2], 0.9 - 1.8,
                               atol=1e-5)
    assert rec['prev_exists'] == 0.0
    assert ds.get_frame(1)['prev_exists'] == 1.0
    assert len(rec['gt_bboxes_2d']) == 2
