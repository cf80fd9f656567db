"""KITTI object-detection AP (2D bbox, 3 difficulties, 40-point interp).

Replaces the external C++ evaluate_object_3d_offline binaries the
reference shells out to (reference: src/lib/dataset/datasets/
kitti.py:91-101; binaries absent from the repo). Implements the KITTI
protocol: per-class AP at IoU 0.7 (car) / 0.5 (ped, cyc), easy/moderate/
hard difficulty gating by bbox height, occlusion, truncation; DontCare
absorption; 40 recall points (R40).
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List

import numpy as np

from centertrack_tpu.eval.mot_metrics import iou_xywh

DIFFICULTY = {
    "easy": {"min_height": 40, "max_occlusion": 0, "max_truncation": 0.15},
    "moderate": {"min_height": 25, "max_occlusion": 1,
                 "max_truncation": 0.3},
    "hard": {"min_height": 25, "max_occlusion": 2, "max_truncation": 0.5},
}
MIN_IOU = {"car": 0.7, "pedestrian": 0.5, "cyclist": 0.5}
NEIGHBOR = {"car": {"van"}, "pedestrian": {"person_sitting"},
            "cyclist": set()}


def _parse_label_file(path: str):
    objs = []
    if not os.path.exists(path):
        return objs
    with open(path) as f:
        for line in f:
            p = line.split()
            if len(p) < 15:
                continue
            objs.append({
                "type": p[0].lower(),
                "truncation": float(p[1]),
                "occlusion": int(float(p[2])),
                "bbox": np.array([float(p[4]), float(p[5]),
                                  float(p[6]) - float(p[4]),
                                  float(p[7]) - float(p[5])]),
                "score": float(p[15]) if len(p) > 15 else 1.0,
            })
    return objs


def _ap_r40(tps, fps, scores, n_gt) -> float:
    if n_gt == 0 or len(scores) == 0:
        return 0.0
    order = np.argsort(-np.asarray(scores), kind="mergesort")
    tp = np.cumsum(np.asarray(tps)[order])
    fp = np.cumsum(np.asarray(fps)[order])
    rec = tp / n_gt
    prec = tp / np.maximum(tp + fp, 1e-9)
    for i in range(len(prec) - 1, 0, -1):
        prec[i - 1] = max(prec[i - 1], prec[i])
    # 40-point interpolation, skipping recall 0 (KITTI R40)
    rec_pts = np.linspace(1.0 / 40, 1.0, 40)
    ap = 0.0
    for r in rec_pts:
        idx = np.searchsorted(rec, r, side="left")
        ap += prec[idx] if idx < len(prec) else 0.0
    return ap / 40


def evaluate_kitti_dir(label_dir: str, results_dir: str,
                       class_names: List[str]) -> Dict[str, Dict[str, float]]:
    """Evaluate per-image result txts against per-image label txts.

    Returns {class: {difficulty: AP}}.
    """
    result_files = sorted(
        f for f in os.listdir(results_dir) if f.endswith(".txt"))
    out = {}
    for cls in [c.lower() for c in class_names]:
        min_iou = MIN_IOU.get(cls, 0.5)
        stats = {}
        for diff_name, diff in DIFFICULTY.items():
            tps, fps, scores = [], [], []
            n_gt = 0
            for fn in result_files:
                gt_objs = _parse_label_file(os.path.join(label_dir, fn))
                dt_objs = [o for o in _parse_label_file(
                    os.path.join(results_dir, fn)) if o["type"] == cls]
                gt_cls, gt_ignored, dontcare = [], [], []
                for o in gt_objs:
                    if o["type"] == cls:
                        hard_ignore = (
                            o["occlusion"] > diff["max_occlusion"] or
                            o["truncation"] > diff["max_truncation"] or
                            o["bbox"][3] < diff["min_height"])
                        (gt_ignored if hard_ignore else gt_cls).append(o)
                    elif o["type"] in NEIGHBOR.get(cls, set()):
                        gt_ignored.append(o)
                    elif o["type"] == "dontcare":
                        dontcare.append(o)
                n_gt += len(gt_cls)
                if not dt_objs:
                    continue
                dt_boxes = np.stack([o["bbox"] for o in dt_objs])
                gt_boxes = (np.stack([o["bbox"] for o in gt_cls])
                            if gt_cls else np.zeros((0, 4)))
                ig_boxes = (np.stack([o["bbox"] for o in
                                      gt_ignored + dontcare])
                            if gt_ignored or dontcare
                            else np.zeros((0, 4)))
                iou_g = iou_xywh(dt_boxes, gt_boxes)
                iou_i = iou_xywh(dt_boxes, ig_boxes)
                taken = np.zeros(len(gt_cls), bool)
                order = np.argsort(
                    [-o["score"] for o in dt_objs], kind="mergesort")
                for di in order:
                    o = dt_objs[di]
                    best, best_iou = -1, min_iou
                    for gi in range(len(gt_cls)):
                        if taken[gi]:
                            continue
                        if iou_g[di, gi] >= best_iou:
                            best_iou = iou_g[di, gi]
                            best = gi
                    if best >= 0:
                        taken[best] = True
                        tps.append(1)
                        fps.append(0)
                        scores.append(o["score"])
                    else:
                        # ignored-gt / DontCare absorption
                        absorbed = (len(ig_boxes) and
                                    iou_i[di].max() >= min_iou)
                        # small dets (below difficulty height) ignored
                        small = o["bbox"][3] < diff["min_height"]
                        if not absorbed and not small:
                            tps.append(0)
                            fps.append(1)
                            scores.append(o["score"])
            stats[diff_name] = _ap_r40(tps, fps, scores, n_gt)
        out[cls] = stats
        print(f"[kitti-det {cls}] " + " ".join(
            f"{d} AP {v * 100:.2f}" for d, v in stats.items()))
    return out
