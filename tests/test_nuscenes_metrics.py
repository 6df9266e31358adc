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


def test_known_answer_hand_derived_nds():
    """External-oracle fixture: every expected number below was derived BY
    HAND on paper from the published devkit algorithm (nuscenes-devkit
    detection/algo.py `accumulate`/`calc_ap`/`calc_tp`, config
    detection_cvpr_2019) — not by running any code in this repository.

    Scenario (one sample, class car): 2 GTs at (0,0) and (10,0), size
    (2,2,2), yaw 0, velocity (0,0), attr vehicle.parked. ONE detection,
    score 0.9, at (1,0) — BEV distance exactly 1.0 m to GT#1 — same size
    and yaw, velocity (3,4), attr vehicle.parked.

    Hand derivation:
      * matching is strict `dist < threshold`, so d=1.0 is a FP at the
        0.5 m AND 1.0 m thresholds -> AP@0.5 = AP@1 = 0.
      * at 2 m / 4 m: one TP, npos=2 -> the single PR operating point is
        (recall 0.5, precision 1.0). np.interp onto the 101-point recall
        grid left-clamps to 1.0 for r <= 0.5 (51 points) and right-fills 0
        beyond. calc_ap drops the first 11 points, leaving 40 points of
        precision 1.0 among 90: AP = mean(max(0, p - 0.1)) / 0.9
        = (40 x 0.9 / 90) / 0.9 = 0.4 / 0.9 = 4/9.
      * class AP = (0 + 0 + 4/9 + 4/9) / 4 = 2/9.
      * TP errors at the 2 m threshold (curves are constant since there is
        a single match): ATE = 1.0, ASE = 0 (identical size), AOE = 0,
        AVE = hypot(3,4) = 5.0, AAE = 0 (attributes agree).
      * NDS = (5*mAP + sum(1 - min(1, err))) / 10
            = (5*(2/9) + (1-1) + (1-0) + (1-0) + (1-min(1,5)) + (1-0)) / 10
            = (10/9 + 3) / 10 = 37/90.
    """
    parked = NUSC_ATTRIBUTES.index('vehicle.parked')
    gt = np.zeros((2, 9))
    gt[:, 3:6] = 2.0
    gt[1, 0] = 10.0
    dt = np.zeros((1, 9))
    dt[0, 0] = 1.0
    dt[0, 3:6] = 2.0
    dt[0, 7:9] = (3.0, 4.0)
    dts = [dict(sample_token='s', boxes=dt, scores=np.array([0.9]),
                labels=np.array([0]), attrs=np.array([parked]))]
    gts = [dict(sample_token='s', boxes=gt, labels=np.array([0, 0]),
                attrs=np.array([parked, parked]))]
    summary, means = evaluate_nuscenes(dts, gts)
    row = summary['car']
    assert row['AP@0.5'] == pytest.approx(0.0, abs=1e-12)
    assert row['AP@1'] == pytest.approx(0.0, abs=1e-12)
    assert row['AP@2'] == pytest.approx(4.0 / 9.0, abs=1e-12)
    assert row['AP@4'] == pytest.approx(4.0 / 9.0, abs=1e-12)
    assert row['AP'] == pytest.approx(2.0 / 9.0, abs=1e-12)
    assert row['ATE'] == pytest.approx(1.0, abs=1e-12)
    assert row['ASE'] == pytest.approx(0.0, abs=1e-12)
    assert row['AOE'] == pytest.approx(0.0, abs=1e-12)
    assert row['AVE'] == pytest.approx(5.0, abs=1e-12)
    assert row['AAE'] == pytest.approx(0.0, abs=1e-12)
    assert means['NDS'] == pytest.approx(37.0 / 90.0, abs=1e-12)


def test_known_answer_yaw_flip_nds():
    """External-oracle fixture #2 (hand-derived): a perfect detection except
    a pi yaw flip. For CAR (period 2pi): AOE = pi saturates its NDS term to
    0, everything else perfect -> NDS = (5 + 1+1+0+1+1)/10 = 0.9 exactly.
    For BARRIER (period pi): AOE = 0, and AVE/AAE are excluded by the
    protocol so NDS renormalizes over 8 terms -> (5 + 1+1+1)/8 = 1.0."""
    parked = NUSC_ATTRIBUTES.index('vehicle.parked')
    gt = np.zeros((1, 9))
    gt[0, 0] = 5.0
    gt[0, 3:6] = 1.5
    dt = gt.copy()
    dt[0, 6] = np.pi

    def run(lbl, attrs):
        return evaluate_nuscenes(
            [dict(sample_token='s', boxes=dt, scores=np.array([0.9]),
                  labels=np.array([lbl]), attrs=attrs)],
            [dict(sample_token='s', boxes=gt, labels=np.array([lbl]),
                  attrs=attrs)])

    _, m_car = run(NUSC_CLASS_NAMES.index('car'), np.array([parked]))
    _, m_bar = run(NUSC_CLASS_NAMES.index('barrier'), np.array([0]))
    assert m_car['NDS'] == pytest.approx(0.9, abs=1e-12)
    assert m_bar['NDS'] == pytest.approx(1.0, abs=1e-12)


def test_default_attribute_heuristic_full_table():
    """The complete mmdet3d NuScenesDataset._format_bbox decision table
    (transcribed from the published mmdet3d source, not from this repo):
    speed > 0.2 m/s vehicles -> moving, two-wheelers -> with_rider; slow
    pedestrians -> standing, slow buses -> stopped; otherwise the
    DefaultAttribute map (parked / without_rider / moving / '')."""
    cases = [
        ('car', 0.3, 'vehicle.moving'),
        ('car', 0.1, 'vehicle.parked'),
        ('truck', 0.3, 'vehicle.moving'),
        ('trailer', 0.1, 'vehicle.parked'),
        ('construction_vehicle', 0.1, 'vehicle.parked'),
        ('bus', 0.5, 'vehicle.moving'),
        ('bus', 0.1, 'vehicle.stopped'),
        ('motorcycle', 0.5, 'cycle.with_rider'),
        ('motorcycle', 0.1, 'cycle.without_rider'),
        ('bicycle', 0.5, 'cycle.with_rider'),
        ('bicycle', 0.1, 'cycle.without_rider'),
        ('pedestrian', 0.5, 'pedestrian.moving'),
        ('pedestrian', 0.1, 'pedestrian.standing'),
        ('barrier', 0.5, ''),
        ('traffic_cone', 0.0, ''),
    ]
    labels = np.array([NUSC_CLASS_NAMES.index(c) for c, _, _ in cases])
    vel = np.array([[sp, 0.0] for _, sp, _ in cases])
    attrs = default_attributes(NUSC_CLASS_NAMES, labels, vel)
    for (cls, sp, want), a in zip(cases, attrs):
        assert NUSC_ATTRIBUTES[a] == want, (cls, sp)


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
