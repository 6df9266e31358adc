"""End-to-end StreamPETR-on-nuScenes path: fake on-disk dataset -> shared
threaded EvalLoader/host pipeline -> jitted streaming forward with temporal
carry -> NMS-free decode -> in-house NDS metrics."""

import pickle

import numpy as np
import pytest

from far3d_tpu.data.loader import EvalLoader
from far3d_tpu.data.nuscenes_dataset import NuScenesSequenceDataset
from far3d_tpu.eval.petr_runner import (collect_and_evaluate_nusc,
                                        petr_host_config, run_inference_petr)
from far3d_tpu.models.streampetr import (StreamPETR, init_petr_state,
                                         tiny_petr_config)

SRC_W, SRC_H = 256, 192


@pytest.fixture(scope='module')
def disk_nusc(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp('nusc')
    rng = np.random.RandomState(0)
    infos = []
    for i in range(4):
        cams = {}
        for c in range(2):
            rel = f'samples/CAM_{c}/{i}.jpg'
            path = root / rel
            path.parent.mkdir(parents=True, exist_ok=True)
            img = rng.randint(0, 255, (SRC_H, SRC_W, 3), np.uint8)
            cv2.imwrite(str(path), img)
            cams[f'CAM_{c}'] = dict(
                data_path=rel,
                cam_intrinsic=np.array([[200., 0, SRC_W / 2],
                                        [0, 200., SRC_H / 2], [0, 0, 1]]),
                sensor2lidar_rotation=np.eye(3),
                sensor2lidar_translation=np.array([1.0, 0, 1.5]))
        boxes = np.zeros((3, 9), np.float32)
        boxes[:, :2] = rng.uniform(-8, 8, (3, 2))
        boxes[:, 3:6] = rng.uniform(1, 3, (3, 3))
        boxes[:, 7:9] = rng.uniform(-1, 1, (3, 2))
        infos.append(dict(
            scene_token='scene0' if i < 2 else 'scene1',
            timestamp=i * 500000,
            lidar2ego_rotation=np.array([1.0, 0, 0, 0]),
            lidar2ego_translation=np.zeros(3),
            ego2global_rotation=np.array([1.0, 0, 0, 0]),
            ego2global_translation=np.array([i * 2.0, 0, 0]),
            cams=cams,
            gt_boxes=boxes,
            gt_names=np.array(['car', 'truck', 'pedestrian']),
            valid_flag=np.ones(3, bool)))
    ann = root / 'infos.pkl'
    with open(ann, 'wb') as f:
        pickle.dump({'infos': infos}, f)
    return str(ann), str(root)


def test_streampetr_nusc_eval_end_to_end(disk_nusc):
    import jax
    import jax.numpy as jnp
    ann, root = disk_nusc
    cfg = tiny_petr_config()
    dataset = NuScenesSequenceDataset(ann, root, seq_split_num=1)
    host_cfg = petr_host_config(cfg, (SRC_W, SRC_H))

    model = StreamPETR(cfg)
    h, w = cfg.input_hw
    n = cfg.num_cams
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        images=jnp.zeros((1, n, h, w, 3)),
        lidar2img=jnp.tile(jnp.eye(4)[None, None], (1, n, 1, 1)),
        state=init_petr_state(1, cfg),
        prev_exists=jnp.zeros((1,)), timestamp=jnp.zeros((1,)),
        ego_pose=jnp.tile(jnp.eye(4)[None], (1, 1, 1)),
        ego_pose_inv=jnp.tile(jnp.eye(4)[None], (1, 1, 1)))

    loader = EvalLoader(dataset, host_cfg)
    assert len(loader) == len(dataset)
    results = run_inference_petr(cfg, variables, loader)
    assert len(results) == len(dataset)
    for r in results:
        assert r['boxes'].shape[1] == 9          # velocity decoded
        assert len(r['scores']) == len(r['labels']) == len(r['boxes'])

    summary, means = collect_and_evaluate_nusc(dataset, results)
    # random weights find ~nothing, but the protocol must run end to end
    # over every GT class present in range
    assert set(summary) == {'car', 'truck', 'pedestrian'}
    assert 'NDS' in means and 0.0 <= means['NDS'] <= 1.0
    for row in summary.values():
        assert 0.0 <= row['AP'] <= 1.0
