"""Hermetic nuScenes evaluator: GT-vs-GT perfection, hand-computable
degradations, and AMOTA behavior under id switches / missing tracks."""

import numpy as np

from centertrack_tpu.eval.nuscenes_eval import (detection_metrics,
                                                quat_to_yaw,
                                                tracking_metrics)


def _box(token, x, y, name="car", score=0.9, tid=1, size=(2, 4, 1.5),
         yaw=0.0, vel=(0.0, 0.0), attr=None):
    if attr is None:
        attr = {"car": "vehicle.moving",
                "pedestrian": "pedestrian.moving"}.get(name, "")
    return {"sample_token": token, "translation": [x, y, 1.0],
            "size": list(size), "yaw": yaw, "velocity": list(vel),
            "attribute_name": attr,
            "detection_name": name, "detection_score": score,
            "tracking_name": name, "tracking_score": score,
            "tracking_id": tid}


def _det_world(n_samples=4, n_per=3):
    gt = {}
    for s in range(n_samples):
        token = f"s{s}"
        gt[token] = [_box(token, 10.0 * i, 5.0 * s) for i in range(n_per)]
    return gt


def test_detection_gt_vs_gt_is_perfect():
    gt = _det_world()
    m = detection_metrics(gt, gt, ["car"])
    assert m["mean_ap"] == 1.0
    assert m["mean_errors"]["ate"] == 0.0
    assert m["mean_errors"]["ase"] == 0.0
    np.testing.assert_allclose(m["nds"], 1.0)


def test_detection_half_recall():
    gt = _det_world(n_samples=2, n_per=4)
    pred = {t: boxes[:2] for t, boxes in gt.items()}  # half the boxes
    m = detection_metrics(gt, pred, ["car"])
    # precision 1 up to recall 0.5 then 0: interp precision is 1 at the
    # 101-pt grid indices 11..50, so AP = 40 / 90
    np.testing.assert_allclose(m["mean_ap"], 40.0 / 90.0, atol=1e-6)


def test_detection_false_positives_hurt_precision():
    gt = _det_world(n_samples=2, n_per=2)
    pred = {t: list(boxes) for t, boxes in gt.items()}
    # low-scored far-away junk: matched never, ranked after all TPs
    for t in pred:
        pred[t] = pred[t] + [_box(t, 900.0, 900.0, score=0.1)]
    m = detection_metrics(gt, pred, ["car"])
    # low-ranked FPs only dent the final precision point (np.interp
    # keeps the last value at the duplicated max-recall x, matching
    # devkit behavior)
    assert m["mean_ap"] > 0.9
    # high-scored FPs hurt much more
    for t in pred:
        pred[t] = pred[t] + [_box(t, 500.0, 500.0, score=0.99)]
    m2 = detection_metrics(gt, pred, ["car"])
    assert m2["mean_ap"] < m["mean_ap"]


def test_detection_distance_thresholds():
    gt = {"s0": [_box("s0", 0.0, 0.0)]}
    # 1.5 m offset: inside {2,4}, outside {0.5,1}
    pred = {"s0": [_box("s0", 1.5, 0.0)]}
    m = detection_metrics(gt, pred, ["car"])
    aps = m["label_aps"]["car"]
    assert aps[0.5] == 0.0 and aps[1.0] == 0.0
    assert aps[2.0] == 1.0 and aps[4.0] == 1.0
    np.testing.assert_allclose(m["mean_ap"], 0.5)
    np.testing.assert_allclose(m["tp_errors"]["car"]["ate"], 1.5)


def test_detection_orientation_and_scale_errors():
    gt = {"s0": [_box("s0", 0.0, 0.0, yaw=0.0, size=(2, 4, 2))]}
    pred = {"s0": [_box("s0", 0.0, 0.0, yaw=np.pi / 2,
                        size=(2, 4, 1))]}
    m = detection_metrics(gt, pred, ["car"])
    np.testing.assert_allclose(m["tp_errors"]["car"]["aoe"], np.pi / 2)
    np.testing.assert_allclose(m["tp_errors"]["car"]["ase"], 0.5)


def test_detection_velocity_and_attribute_errors():
    """Official 5-term NDS: AVE is the 2D velocity L2 error, AAE is
    1 - attribute accuracy over TPs (devkit definitions,
    reference consumer: src/lib/dataset/datasets/nuscenes.py:202-221)."""
    gt = {"s0": [_box("s0", 0.0, 0.0, vel=(1.0, 0.0),
                      attr="vehicle.moving"),
                 _box("s0", 10.0, 0.0, vel=(0.0, 0.0),
                      attr="vehicle.parked")]}
    pred = {"s0": [_box("s0", 0.0, 0.0, vel=(1.0, 2.0),
                        attr="vehicle.moving"),
                   _box("s0", 10.0, 0.0, vel=(0.0, 0.0),
                        attr="vehicle.moving")]}
    m = detection_metrics(gt, pred, ["car"])
    np.testing.assert_allclose(m["tp_errors"]["car"]["ave"], 1.0)
    np.testing.assert_allclose(m["tp_errors"]["car"]["aae"], 0.5)
    # NDS = (5*1 + (1-0) + (1-0) + (1-0) + (1-min(1,1)) + (1-0.5)) / 10
    np.testing.assert_allclose(m["nds"], (5 + 3 + 0 + 0.5) / 10.0)
    # the legacy 3-error variant ignores both
    np.testing.assert_allclose(m["nds_3err"], 1.0)


def test_detection_class_exclusions():
    """Barrier has no velocity/attribute terms and a 180-degree
    orientation period; traffic_cone has no orientation either."""
    gt = {"s0": [_box("s0", 0.0, 0.0, name="barrier", yaw=0.0,
                      vel=(0.0, 0.0), attr="")]}
    pred = {"s0": [_box("s0", 0.0, 0.0, name="barrier", yaw=np.pi,
                        vel=(5.0, 5.0), attr="junk")]}
    m = detection_metrics(gt, pred, ["barrier"])
    # pi flip == 0 under the barrier's pi period
    np.testing.assert_allclose(m["tp_errors"]["barrier"]["aoe"], 0.0,
                               atol=1e-9)
    assert np.isnan(m["tp_errors"]["barrier"]["ave"])
    assert np.isnan(m["tp_errors"]["barrier"]["aae"])
    gt = {"s0": [_box("s0", 0.0, 0.0, name="traffic_cone", yaw=0.0)]}
    pred = {"s0": [_box("s0", 0.0, 0.0, name="traffic_cone",
                        yaw=2.0)]}
    m = detection_metrics(gt, pred, ["traffic_cone"])
    assert np.isnan(m["tp_errors"]["traffic_cone"]["aoe"])


def _track_world(n_frames=6, n_tracks=2):
    """Two parallel tracks moving along +x, one scene."""
    gt = {}
    tokens = []
    for f in range(n_frames):
        token = f"f{f}"
        tokens.append(token)
        gt[token] = [_box(token, 2.0 * f, 10.0 * k, tid=k + 1)
                     for k in range(n_tracks)]
    return gt, [tokens]


def test_tracking_gt_vs_gt_is_perfect():
    gt, scenes = _track_world()
    m = tracking_metrics(scenes, gt, gt, class_names=("car",))
    np.testing.assert_allclose(m["amota"], 1.0)
    assert m["amotp"] < 1e-9
    np.testing.assert_allclose(m["per_class"]["car"]["mota"], 1.0)


def test_tracking_id_switch_penalized():
    gt, scenes = _track_world(n_frames=6, n_tracks=1)
    pred = {}
    for f, token in enumerate(scenes[0]):
        tid = 1 if f < 3 else 7  # switch halfway
        pred[token] = [_box(token, 2.0 * f, 0.0, tid=tid)]
    m = tracking_metrics(scenes, gt, pred, class_names=("car",))
    perfect = tracking_metrics(scenes, gt, gt, class_names=("car",))
    assert m["amota"] < perfect["amota"]
    # exactly one switch in 6 GT boxes at full recall:
    # MOTAR = 1 - 1/6 at every achieved threshold
    np.testing.assert_allclose(m["per_class"]["car"]["amota"],
                               1.0 - 1.0 / 6.0, atol=1e-6)


def test_tracking_missing_track_caps_recall():
    gt, scenes = _track_world(n_frames=4, n_tracks=2)
    pred = {t: [b for b in boxes if b["tracking_id"] == 1]
            for t, boxes in gt.items()}
    m = tracking_metrics(scenes, gt, pred, class_names=("car",))
    # recall caps at 0.5: sweep targets above 0.5 contribute 0; at or
    # below 0.5 tracking is perfect (no FP/IDS)
    targets = np.linspace(0.1, 1.0, 40)
    achievable = (targets <= 0.5).mean()
    assert abs(m["amota"] - achievable) < 0.1


def test_tracking_class_sliced():
    gt, scenes = _track_world(n_frames=4, n_tracks=1)
    for token in scenes[0]:
        gt[token].append(_box(token, 0.0, 50.0, name="pedestrian",
                              tid=9))
    pred = {t: [b for b in boxes if b["tracking_name"] == "car"]
            for t, boxes in gt.items()}
    m = tracking_metrics(scenes, gt, pred,
                         class_names=("car", "pedestrian"))
    np.testing.assert_allclose(m["per_class"]["car"]["amota"], 1.0)
    assert m["per_class"]["pedestrian"]["amota"] == 0.0
    np.testing.assert_allclose(m["amota"], 0.5)


def test_quat_to_yaw():
    for yaw in (-2.5, -0.3, 0.0, 1.2, 3.0):
        q = [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]
        np.testing.assert_allclose(quat_to_yaw(q), yaw, atol=1e-9)
