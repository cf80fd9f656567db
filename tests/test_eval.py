import numpy as np
import os
import pytest

from centertrack_tpu.eval.mot_metrics import (MOTAccumulator,
                                              combine_metrics, iou_xywh)
from centertrack_tpu.eval.coco_eval import evaluate_coco_bbox
from centertrack_tpu.data.coco_api import COCO


def box(x, y, w=10, h=10):
    return np.array([x, y, w, h], np.float64)


def test_iou():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[0, 0, 10, 10], [5, 0, 10, 10], [20, 20, 5, 5]])
    iou = iou_xywh(a, b)
    np.testing.assert_allclose(iou[0], [1.0, 50 / 150, 0.0], atol=1e-6)


def test_perfect_tracking():
    acc = MOTAccumulator()
    for f in range(10):
        acc.update([1, 2], np.stack([box(0, 0), box(50, 50)]),
                   [7, 8], np.stack([box(0, 0), box(50, 50)]))
    m = acc.metrics()
    assert m["mota"] == 1.0
    assert m["idf1"] == 1.0
    assert m["num_switches"] == 0
    assert m["mostly_tracked"] == 2
    assert m["motp"] == 0.0


def test_id_switch_counted():
    acc = MOTAccumulator()
    for f in range(4):
        hyp_id = 7 if f < 2 else 9
        acc.update([1], box(0, 0).reshape(1, 4),
                   [hyp_id], box(0, 0).reshape(1, 4))
    m = acc.metrics()
    assert m["num_switches"] == 1
    np.testing.assert_allclose(m["mota"], 1.0 - 1 / 4)
    # idf1: best assignment covers 2 of 4 frames
    np.testing.assert_allclose(m["idf1"], 2 * 2 / (2 * 2 + 2 + 2))


def test_fp_and_misses():
    acc = MOTAccumulator()
    for f in range(5):
        # gt present but no hyp: 5 misses
        acc.update([1], box(0, 0).reshape(1, 4), [], np.zeros((0, 4)))
    for f in range(5):
        # hyp but no gt: 5 false positives (gt absent -> num_objects
        # unchanged)
        acc.update([], np.zeros((0, 4)), [7], box(0, 0).reshape(1, 4))
    m = acc.metrics()
    assert m["num_misses"] == 5
    assert m["num_false_positives"] == 5
    np.testing.assert_allclose(m["mota"], 1.0 - 10 / 5)


def test_match_carryover_prevents_greedy_switch():
    # motmetrics keeps previous matches even when a new hyp is closer
    acc = MOTAccumulator()
    acc.update([1], box(0, 0).reshape(1, 4),
               [7], box(1, 0).reshape(1, 4))
    # next frame: hyp 8 is a perfect fit, but 7 still valid -> keep 7
    acc.update([1], box(0, 0).reshape(1, 4),
               [7, 8], np.stack([box(1, 0), box(0, 0)]))
    assert acc.num_switches == 0
    assert acc.num_false_positives == 1  # hyp 8 unmatched


def test_fragmentation():
    acc = MOTAccumulator()
    acc.update([1], box(0, 0).reshape(1, 4), [7], box(0, 0).reshape(1, 4))
    acc.update([1], box(0, 0).reshape(1, 4), [], np.zeros((0, 4)))
    acc.update([1], box(0, 0).reshape(1, 4), [7], box(0, 0).reshape(1, 4))
    m = acc.metrics()
    assert m["num_fragmentations"] == 1
    assert m["num_switches"] == 0


def test_combine_overall():
    a1, a2 = MOTAccumulator(), MOTAccumulator()
    for f in range(4):
        a1.update([1], box(0, 0).reshape(1, 4), [7],
                  box(0, 0).reshape(1, 4))
        a2.update([1], box(0, 0).reshape(1, 4), [], np.zeros((0, 4)))
    per = {"s1": a1.metrics(), "s2": a2.metrics()}
    overall = combine_metrics(per, {"s1": a1, "s2": a2})
    np.testing.assert_allclose(overall["mota"], 1.0 - 4 / 8)


# ---------------------------------------------------------------------
def _coco_gt():
    return COCO(dataset={
        "images": [{"id": 1, "width": 100, "height": 100}],
        "categories": [{"id": 1, "name": "a"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 1,
             "bbox": [50, 50, 20, 20], "area": 400, "iscrowd": 0},
        ],
    })


def test_coco_eval_perfect():
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 20, 20],
         "score": 0.8},
    ]
    stats = evaluate_coco_bbox(_coco_gt(), dets, verbose=False)
    np.testing.assert_allclose(stats["AP"], 1.0, atol=1e-6)
    np.testing.assert_allclose(stats["AP50"], 1.0, atol=1e-6)


def test_coco_eval_half_recall():
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
         "score": 0.9},
    ]
    stats = evaluate_coco_bbox(_coco_gt(), dets, verbose=False)
    # precision 1 up to recall 0.5, 0 beyond: 101-pt AP ~= 51/101
    np.testing.assert_allclose(stats["AP50"], 51 / 101, atol=0.01)


def test_coco_eval_fp_penalty():
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 20, 20],
         "score": 0.8},
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 5, 5],
         "score": 0.95},  # high-scoring FP
    ]
    stats = evaluate_coco_bbox(_coco_gt(), dets, verbose=False)
    assert stats["AP50"] < 1.0


def test_kitti_tracking_gt_vs_gt_is_perfect():
    from centertrack_tpu.eval.kitti_track_eval import (
        evaluate_kitti_tracking, FIXTURE_DIR)
    gt_dir = os.path.join(FIXTURE_DIR, "label_02_val_half")
    if not os.path.isdir(gt_dir):
        pytest.skip("fixtures missing")
    out = evaluate_kitti_tracking(gt_dir, "val_half")
    assert out["car"]["mota"] == 1.0
    assert out["pedestrian"]["mota"] == 1.0
    assert out["car"]["num_switches"] == 0


def test_keypoint_eval_perfect():
    from centertrack_tpu.eval.coco_eval import evaluate_coco_keypoints
    kps = []
    for i in range(17):
        kps += [20 + i, 30 + i, 2]
    gt = COCO(dataset={
        "images": [{"id": 1, "width": 100, "height": 100}],
        "categories": [{"id": 1, "name": "person"}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                         "bbox": [10, 10, 40, 40], "area": 1600,
                         "iscrowd": 0, "keypoints": kps,
                         "num_keypoints": 17}],
    })
    dets = [{"image_id": 1, "category_id": 1, "score": 0.9,
             "bbox": [10, 10, 40, 40], "keypoints": kps}]
    stats = evaluate_coco_keypoints(gt, dets, verbose=False)
    np.testing.assert_allclose(stats["AP"], 1.0, atol=1e-6)


def test_keypoint_eval_jittered():
    from centertrack_tpu.eval.coco_eval import evaluate_coco_keypoints
    rng = np.random.RandomState(0)
    kps, kps_noisy = [], []
    for i in range(17):
        x, y = 20 + i, 30 + i
        kps += [x, y, 2]
        kps_noisy += [x + 50, y + 50, 2]  # way off
    gt = COCO(dataset={
        "images": [{"id": 1, "width": 200, "height": 200}],
        "categories": [{"id": 1, "name": "person"}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                         "bbox": [10, 10, 40, 40], "area": 1600,
                         "iscrowd": 0, "keypoints": kps,
                         "num_keypoints": 17}],
    })
    dets = [{"image_id": 1, "category_id": 1, "score": 0.9,
             "bbox": [10, 10, 40, 40], "keypoints": kps_noisy}]
    stats = evaluate_coco_keypoints(gt, dets, verbose=False)
    assert stats["AP"] < 0.1
