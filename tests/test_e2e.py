"""End-to-end integration: synthetic AV2 dataset on disk -> loader ->
jitted streaming inference -> AV2 metrics; and a short synthetic train run."""

import numpy as np
import pytest

from far3d_tpu.config import tiny_test_config
from far3d_tpu.data.av2_dataset import AV2SequenceDataset
from far3d_tpu.data.loader import EvalLoader, TrainLoader


@pytest.fixture(scope='module')
def disk_dataset(tmp_path_factory):
    """Fake AV2: 2 scenes x 4 frames x 2 cams with real jpgs on disk."""
    import cv2
    from test_data import make_fake_infos
    root = tmp_path_factory.mktemp('av2')
    p = root / 'infos.pkl'
    make_fake_infos(p, n_scenes=2, frames_per_scene=4, n_cams=2)
    import pickle
    with open(p, 'rb') as f:
        infos = pickle.load(f)['infos']
    rng = np.random.RandomState(0)
    for info in infos:
        for cam in info['cam_infos'].values():
            path = root / cam['fpath']
            path.parent.mkdir(parents=True, exist_ok=True)
            img = (rng.rand(128, 192, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(path), img)
    return str(p), str(root)


def test_streaming_eval_end_to_end(disk_dataset):
    ann, root = disk_dataset
    cfg = tiny_test_config()
    import jax
    from far3d_tpu.eval.av2_metrics import DetectionConfig
    from far3d_tpu.eval.runner import collect_and_evaluate, run_inference
    from far3d_tpu.train.step import create_train_state

    dataset = AV2SequenceDataset(ann, root, split='val', seq_split_num=1,
                                 test_mode=False)
    state, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    variables = {'params': state.params, 'stats': state.stats,
                 'batch_stats': state.batch_stats}
    loader = EvalLoader(dataset, cfg)
    results = run_inference(cfg, variables, loader)
    assert len(results) == len(dataset)
    for r in results:
        assert r['boxes'].shape[1] == 7
        assert len(r['scores']) == len(r['labels']) == len(r['boxes'])
    out = collect_and_evaluate(cfg, dataset, f'{root}/results', 0, 1, results)
    assert out is not None
    summary, means = out
    assert 0.0 <= means['mAP'] <= 1.0

    # capped eval: GT must be restricted to the evaluated frames — counting
    # the whole dataset's GTs deflates recall/mAP (reference protocol
    # evaluates exactly the frames it ran, test.py:116-160)
    half = results[:len(results) // 2]
    s_half, _ = collect_and_evaluate(cfg, dataset, f'{root}/results_half',
                                     0, 1, half)
    full_gts = sum(r['num_gts'] for r in summary.values())
    half_gts = sum(r['num_gts'] for r in s_half.values())
    # fixture GTs all lie well inside the 150 m range gate, so the evaluated
    # count must equal the raw GT count of exactly the evaluated frames
    want = sum(len(dataset.get_frame(r['index'])['gt_boxes_3d'])
               for r in half)
    assert half_gts < full_gts
    assert half_gts == want


def test_train_loop_end_to_end(disk_dataset):
    import dataclasses
    ann, root = disk_dataset
    cfg = tiny_test_config()
    # checkpoint_every > max_iters: the final state must still be saved via
    # the off-interval force-save in run_training (orbax would skip it)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                checkpoint_every=3))
    from far3d_tpu.train.runner import run_training

    dataset = AV2SequenceDataset(ann, root, split='train', seq_split_num=2)
    loader = TrainLoader(dataset, cfg, batch_size=2, seed=0, num_threads=2)
    state = run_training(cfg, loader, f'{root}/work', batch_size=2,
                         resume=False, max_iters=2)
    loader.stop()
    assert int(state.step) == 2
    # checkpoint written and restorable
    from far3d_tpu.utils.checkpoint import CheckpointManager
    mgr = CheckpointManager(f'{root}/work')
    assert mgr.latest_step() == 2


def test_restore_is_dispatch_identical(tmp_path):
    """A restored TrainState must hit the SAME jit dispatch-cache entry as a
    fresh one. Orbax returns committed leaves while jit outputs are
    uncommitted; without the committed-ness matching in
    CheckpointManager.restore, every resume silently recompiled the whole
    train step (a multi-minute remote compile on the TPU runtime)."""
    import jax

    from far3d_tpu.train.step import create_train_state, make_train_step
    from far3d_tpu.utils.checkpoint import CheckpointManager
    from far3d_tpu.utils.synthetic import synthetic_batch

    cfg = tiny_test_config()
    state, t0 = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    mgr = CheckpointManager(str(tmp_path / 'ckpt'), max_to_keep=1,
                            save_interval=1)
    mgr.save(1, state)
    mgr.close()
    fresh, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch=1)
    restored = CheckpointManager(str(tmp_path / 'ckpt')).restore(fresh)

    step = jax.jit(make_train_step(cfg, use_gt_depth=True))
    b = synthetic_batch(cfg, batch=1)
    out1 = step(state, t0, b, jax.random.PRNGKey(1))
    assert step._cache_size() == 1
    out2 = step(restored, t0, b, jax.random.PRNGKey(1))
    assert step._cache_size() == 1, 'restored state recompiled the step'
    # and the resumed step is bit-identical to the continuous one
    import numpy as np
    np.testing.assert_array_equal(np.asarray(out1[2]['total_loss']),
                                  np.asarray(out2[2]['total_loss']))
