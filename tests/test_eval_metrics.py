"""AV2 metric implementation sanity tests."""

import numpy as np

from far3d_tpu.eval.av2_metrics import (DetectionConfig, evaluate_detections,
                                        iou_3d_axis_aligned, wrap_angles)


def _frame(log, ts, boxes, labels, scores=None, pts=None):
    d = dict(log_id=log, timestamp_ns=ts, boxes=np.asarray(boxes, np.float64),
             labels=np.asarray(labels))
    if scores is not None:
        d['scores'] = np.asarray(scores)
    if pts is not None:
        d['num_interior_pts'] = np.asarray(pts)
    return d


def test_perfect_detections_ap1():
    boxes = np.array([[10, 0, 1, 4, 2, 1.5, 0.3],
                      [-20, 5, 1, 4, 2, 1.5, -1.0]])
    dets = [_frame('log0', 0, boxes, [15, 15], scores=[0.9, 0.8])]
    anns = [_frame('log0', 0, boxes, [15, 15], pts=[10, 10])]
    summary, means = evaluate_detections(dets, anns)
    cat = 'REGULAR_VEHICLE'
    assert abs(summary[cat]['AP'] - 1.0) < 1e-6
    assert summary[cat]['ATE'] < 1e-6
    assert summary[cat]['ASE'] < 1e-6
    assert summary[cat]['AOE'] < 1e-6
    assert abs(summary[cat]['CDS'] - 1.0) < 1e-6
    assert abs(means['mAP'] - 1.0) < 1e-6


def test_missed_and_false_positives():
    gt = np.array([[10, 0, 1, 4, 2, 1.5, 0.0]])
    # one 1.5m-off detection (TP at 2m/4m, FP at 0.5m/1m) + one far FP
    det = np.array([[11.5, 0, 1, 4, 2, 1.5, 0.0],
                    [80, 80, 1, 4, 2, 1.5, 0.0]])
    dets = [_frame('l', 0, det, [15, 15], scores=[0.9, 0.8])]
    anns = [_frame('l', 0, gt, [15], pts=[5])]
    summary, _ = evaluate_detections(dets, anns)
    ap = summary['REGULAR_VEHICLE']['AP']
    assert 0 < ap < 1
    # translation error ~1.5 for the single TP at the 2m threshold
    assert abs(summary['REGULAR_VEHICLE']['ATE'] - 1.5) < 1e-6


def test_range_gate():
    gt = np.array([[200, 0, 1, 4, 2, 1.5, 0.0]])   # out of 150m range
    dets = [_frame('l', 0, gt, [15], scores=[0.9])]
    anns = [_frame('l', 0, gt, [15], pts=[5])]
    summary, means = evaluate_detections(dets, anns)
    assert 'REGULAR_VEHICLE' not in summary        # zero evaluated gts


def test_wrap_angles():
    np.testing.assert_allclose(wrap_angles(np.array([0.3])), [0.3])
    np.testing.assert_allclose(wrap_angles(np.array([-0.3])), [0.3])
    np.testing.assert_allclose(wrap_angles(np.array([np.pi + 0.1])),
                               [np.pi - 0.1], atol=1e-9)


def test_iou_axis_aligned():
    a = np.array([[2.0, 2, 2]])
    np.testing.assert_allclose(iou_3d_axis_aligned(a, a), [1.0])
    b = np.array([[1.0, 2, 2]])
    np.testing.assert_allclose(iou_3d_axis_aligned(a, b), [0.5])


def test_roi_masking_gates_dts_and_gts():
    """HD-map ROI masking (av2_eval_util.py:158-176): detections and GTs
    outside the rasterized drivable area are excluded from evaluation."""
    from far3d_tpu.eval.av2_metrics import (DetectionConfig, RasterROI,
                                            evaluate_detections)

    # ROI = the half-plane x >= 0 (50x100 cells, 1 m resolution, origin at
    # (-50, -50)); everything with x < 0 is off-map
    grid = np.zeros((100, 100), bool)
    grid[:, 50:] = True
    roi = RasterROI(grid=grid, origin_xy=(-50.0, -50.0), resolution_m=1.0)
    assert roi.contains(np.asarray([[10.0, 0.0]]))[0]
    assert not roi.contains(np.asarray([[-10.0, 0.0]]))[0]
    assert not roi.contains(np.asarray([[999.0, 0.0]]))[0]   # off-grid

    box = lambda x: [x, 0.0, 1.0, 4.0, 2.0, 1.5, 0.0]
    # two GTs inside the ROI, one outside; detections match the inside GTs
    # exactly and add one false positive OUTSIDE the ROI
    ann = [dict(log_id='log0', timestamp_ns=0,
                boxes=np.asarray([box(10.0), box(20.0), box(-10.0)]),
                labels=np.asarray([0, 0, 0]),
                num_interior_pts=np.ones(3))]
    det = [dict(log_id='log0', timestamp_ns=0,
                boxes=np.asarray([box(10.0), box(20.0), box(-20.0)]),
                scores=np.asarray([0.9, 0.8, 0.95]),
                labels=np.asarray([0, 0, 0]))]
    cfg = DetectionConfig(categories=('ARTICULATED_BUS',))

    # with the ROI: the outside GT and outside FP vanish -> perfect AP
    summary, means = evaluate_detections(det, ann, cfg,
                                         roi_masks={'log0': roi})
    s = summary['ARTICULATED_BUS']
    assert s['num_gts'] == 2
    assert s['AP'] > 0.99, s

    # without: 3 GTs (one unmatched) and a high-scoring FP hurt AP
    summary2, _ = evaluate_detections(det, ann, cfg)
    s2 = summary2['ARTICULATED_BUS']
    assert s2['num_gts'] == 3
    assert s2['AP'] < s['AP']


def test_worker_pool_matches_serial():
    """workers>0 must not change results (threaded per-sweep accumulation)."""
    rng = np.random.RandomState(7)
    dts, gts = [], []
    for f in range(4):
        n, m = 12, 9
        boxes = np.concatenate([rng.uniform(-40, 40, (m, 2)),
                                rng.uniform(0, 2, (m, 1)),
                                rng.uniform(1, 4, (m, 3)),
                                rng.uniform(-3, 3, (m, 1))], axis=1)
        noisy = boxes[rng.randint(0, m, n)] + rng.randn(n, 7) * 0.3
        dts.append(dict(log_id='log0', timestamp_ns=f, boxes=noisy,
                        scores=rng.rand(n),
                        labels=rng.randint(0, 3, n)))
        gts.append(dict(log_id='log0', timestamp_ns=f, boxes=boxes,
                        labels=rng.randint(0, 3, m),
                        num_interior_pts=np.full(m, 5)))
    cfg = DetectionConfig()
    s0, m0 = evaluate_detections(dts, gts, cfg, workers=0)
    s1, m1 = evaluate_detections(dts, gts, cfg, workers=3)
    assert m0 == m1
    assert s0.keys() == s1.keys()
    for k in s0:
        for field in s0[k]:
            assert s0[k][field] == s1[k][field], (k, field)
