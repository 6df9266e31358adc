"""In-house nuScenes metric protocol (eval/nuscenes_metrics.py) vs
hand-computed expectations of the official devkit math."""

import numpy as np
import pytest

from far3d_tpu.eval.nuscenes_metrics import (
    NUSC_ATTRIBUTES, NUSC_CLASS_NAMES, NuScenesDetectionConfig,
    default_attributes, evaluate_nuscenes, format_nuscenes_summary)


def _boxes(n, rng, spread=30.0):
    b = np.zeros((n, 9))
    b[:, :2] = rng.uniform(-spread, spread, (n, 2))
    b[:, 2] = rng.uniform(-1, 1, n)
    b[:, 3:6] = rng.uniform(1, 4, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    b[:, 7:9] = rng.uniform(-2, 2, (n, 2))
    return b


def _frames(rng, n_samples=3, n_gt=8, label_pool=(0, 1, 8)):
    dts, gts = [], []
    for s in range(n_samples):
        boxes = _boxes(n_gt, rng)
        labels = rng.choice(label_pool, n_gt)
        gts.append(dict(sample_token=f's{s}', boxes=boxes, labels=labels))
        dts.append(dict(sample_token=f's{s}', boxes=boxes.copy(),
                        scores=rng.uniform(0.5, 1.0, n_gt),
                        labels=labels.copy()))
    return dts, gts


def test_perfect_predictions_give_nds_1():
    rng = np.random.RandomState(0)
    dts, gts = _frames(rng)
    summary, means = evaluate_nuscenes(dts, gts)
    for c, row in summary.items():
        assert row['AP'] == pytest.approx(1.0, abs=1e-6), c
        for lab in ('ATE', 'ASE', 'AOE', 'AVE', 'AAE'):
            if not np.isnan(row[lab]):
                assert row[lab] == pytest.approx(0.0, abs=1e-6), (c, lab)
    assert means['mAP'] == pytest.approx(1.0, abs=1e-6)
    assert means['NDS'] == pytest.approx(1.0, abs=1e-6)
    assert 'NDS=' in format_nuscenes_summary(summary, means)


def test_translation_error_and_threshold_gating():
    """3 m offset: misses the 0.5/1/2 m thresholds, hits 4 m; ATE is
    measured at the 2 m TP threshold so the class TP row saturates to 1."""
    gt = np.zeros((1, 9))
    gt[0, 3:6] = 2.0
    dt = gt.copy()
    dt[0, 0] = 3.0
    dts = [dict(sample_token='s', boxes=dt, scores=np.array([0.9]),
                labels=np.array([0]))]
    gts = [dict(sample_token='s', boxes=gt, labels=np.array([0]))]
    summary, means = evaluate_nuscenes(dts, gts)
    row = summary['car']
    assert row['AP@0.5'] == 0.0 and row['AP@2'] == 0.0
    assert row['AP@4'] > 0.9
    assert row['ATE'] == pytest.approx(1.0)   # no match at the 2 m threshold


def test_small_translation_measured_in_ate():
    gt = np.zeros((2, 9))
    gt[:, 3:6] = 2.0
    gt[1, 0] = 10.0
    dt = gt.copy()
    dt[:, 1] += 0.5    # constant 0.5 m BEV offset
    dts = [dict(sample_token='s', boxes=dt, scores=np.array([0.9, 0.8]),
                labels=np.array([0, 0]))]
    gts = [dict(sample_token='s', boxes=gt, labels=np.array([0, 0]))]
    summary, _ = evaluate_nuscenes(dts, gts)
    assert summary['car']['ATE'] == pytest.approx(0.5, abs=1e-6)


def test_barrier_yaw_period_and_exclusions():
    """A pi yaw flip is 0 orientation error for barrier (period pi), pi for
    car; barrier AVE/AAE and cone AOE/AVE/AAE are n/a."""
    gt = np.zeros((1, 9))
    gt[0, 3:6] = 1.5
    dt = gt.copy()
    dt[0, 6] = np.pi        # flipped
    mk = lambda lbl: ([dict(sample_token='s', boxes=dt,
                            scores=np.array([0.9]),
                            labels=np.array([lbl]))],
                      [dict(sample_token='s', boxes=gt,
                            labels=np.array([lbl]))])
    bi = NUSC_CLASS_NAMES.index('barrier')
    ci = NUSC_CLASS_NAMES.index('car')
    ti = NUSC_CLASS_NAMES.index('traffic_cone')
    s_bar, _ = evaluate_nuscenes(*mk(bi))
    s_car, _ = evaluate_nuscenes(*mk(ci))
    s_cone, _ = evaluate_nuscenes(*mk(ti))
    assert s_bar['barrier']['AOE'] == pytest.approx(0.0, abs=1e-9)
    assert s_car['car']['AOE'] == pytest.approx(np.pi, rel=1e-6)
    assert np.isnan(s_bar['barrier']['AVE'])
    assert np.isnan(s_bar['barrier']['AAE'])
    assert np.isnan(s_cone['traffic_cone']['AOE'])


def test_velocity_error_measured():
    gt = np.zeros((1, 9))
    gt[0, 3:6] = 2.0
    gt[0, 7:9] = (1.0, 0.0)
    dt = gt.copy()
    dt[0, 7:9] = (1.0, 2.0)
    dts = [dict(sample_token='s', boxes=dt, scores=np.array([0.9]),
                labels=np.array([0]))]
    gts = [dict(sample_token='s', boxes=gt, labels=np.array([0]))]
    summary, _ = evaluate_nuscenes(dts, gts)
    assert summary['car']['AVE'] == pytest.approx(2.0, abs=1e-6)


def test_default_attribute_heuristic():
    """mmdet3d velocity heuristic: moving car -> vehicle.moving, parked car
    -> vehicle.parked, slow pedestrian -> standing, slow bus -> stopped."""
    labels = np.array([0, 0, 8, 3])     # car, car, pedestrian, bus
    vel = np.array([[3.0, 0], [0.05, 0], [0.0, 0], [0.1, 0]])
    attrs = default_attributes(NUSC_CLASS_NAMES, labels, vel)
    assert NUSC_ATTRIBUTES[attrs[0]] == 'vehicle.moving'
    assert NUSC_ATTRIBUTES[attrs[1]] == 'vehicle.parked'
    assert NUSC_ATTRIBUTES[attrs[2]] == 'pedestrian.standing'
    assert NUSC_ATTRIBUTES[attrs[3]] == 'vehicle.stopped'


def test_attribute_error_counts_mismatch():
    gt = np.zeros((1, 9))
    gt[0, 3:6] = 2.0
    dts = [dict(sample_token='s', boxes=gt.copy(), scores=np.array([0.9]),
                labels=np.array([0]),
                attrs=np.array([NUSC_ATTRIBUTES.index('vehicle.moving')]))]
    gts = [dict(sample_token='s', boxes=gt, labels=np.array([0]),
                attrs=np.array([NUSC_ATTRIBUTES.index('vehicle.parked')]))]
    summary, _ = evaluate_nuscenes(dts, gts)
    assert summary['car']['AAE'] == pytest.approx(1.0)


def test_class_range_gate():
    """A cone at 35 m is outside its 30 m class range: excluded from both
    GT and detections (no FP, no GT)."""
    near = np.zeros((1, 9)); near[0, 3:6] = 1.0
    far = near.copy(); far[0, 0] = 35.0
    ti = NUSC_CLASS_NAMES.index('traffic_cone')
    dts = [dict(sample_token='s', boxes=np.concatenate([near, far]),
                scores=np.array([0.9, 0.95]), labels=np.array([ti, ti]))]
    gts = [dict(sample_token='s', boxes=np.concatenate([near, far]),
                labels=np.array([ti, ti]))]
    summary, _ = evaluate_nuscenes(dts, gts)
    assert summary['traffic_cone']['num_gts'] == 1
    assert summary['traffic_cone']['AP'] == pytest.approx(1.0, abs=1e-6)


def test_fp_halves_precision():
    """1 perfect TP + 1 far FP with higher score: AP reflects the devkit's
    interpolated normalized area (precision 0.5 until the TP at recall 1)."""
    gt = np.zeros((1, 9)); gt[0, 3:6] = 2.0
    fp = gt.copy(); fp[0, :2] = (20.0, 20.0)
    dts = [dict(sample_token='s', boxes=np.concatenate([gt, fp]),
                scores=np.array([0.8, 0.9]), labels=np.array([0, 0]))]
    gts = [dict(sample_token='s', boxes=gt, labels=np.array([0]))]
    summary, _ = evaluate_nuscenes(dts, gts)
    # devkit semantics: np.interp ramps precision linearly between the two
    # operating points (0, 0) and (1, 0.5), so prec(r) = 0.5 r on the grid;
    # AP = mean over r in (0.1, 1] of max(0, 0.5 r - 0.1) / 0.9
    r = np.linspace(0, 1, 101)[11:]
    want = float(np.mean(np.maximum(0.0, 0.5 * r - 0.1))) / 0.9
    assert summary['car']['AP'] == pytest.approx(want, abs=1e-9)


def test_nds_formula():
    rng = np.random.RandomState(3)
    dts, gts = _frames(rng)
    # corrupt translations a little so errors are non-trivial; give the GTs
    # real attributes so all 5 TP terms are defined (denominator 10)
    for d, g in zip(dts, gts):
        d['boxes'][:, :2] += rng.uniform(-0.3, 0.3, (len(d['boxes']), 2))
        g['attrs'] = rng.randint(1, 4, len(g['boxes']))
        d['attrs'] = rng.randint(1, 4, len(d['boxes']))
    summary, means = evaluate_nuscenes(dts, gts)
    tp_terms = sum(1.0 - min(1.0, means['m' + k])
                   for k in ('ATE', 'ASE', 'AOE', 'AVE', 'AAE'))
    assert not np.isnan(means['mAAE'])
    assert means['NDS'] == pytest.approx(
        (5 * means['mAP'] + tp_terms) / 10.0, abs=1e-9)


def test_nds_renormalizes_without_gt_attributes():
    """No real GT attributes anywhere -> AAE n/a, NDS over 9 terms; perfect
    predictions still score 1.0."""
    rng = np.random.RandomState(5)
    dts, gts = _frames(rng)
    summary, means = evaluate_nuscenes(dts, gts)
    assert np.isnan(means['mAAE'])
    for row in summary.values():
        assert np.isnan(row['AAE'])
    assert means['NDS'] == pytest.approx(1.0, abs=1e-6)
