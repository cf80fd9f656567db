"""KITTI multi-object-tracking evaluation (CLEAR-MOT per class).

Replaces the reference's vendored devkit port
(reference: src/tools/eval_kitti_track/evaluate_tracking.py, 987 LoC)
with a hermetic implementation on top of eval/mot_metrics.py. KITTI
specifics handled: label_02 format (frame track_id type trunc occ alpha
x1 y1 x2 y2 dim loc rot_y), per-class eval (Car, Pedestrian),
DontCare-region FP absorption, neighboring-class ignores (Van for car,
Person_sitting for pedestrian).

GT fixtures live in data_fixtures/kitti_tracking (the public KITTI
devkit ground truth the reference also ships), so MOTA is computable
offline with no downloads.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from centertrack_tpu.eval.mot_metrics import (MOTAccumulator,
                                              combine_metrics, iou_xywh)

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "data_fixtures", "kitti_tracking")

CLASSES = {
    "car": {"main": {"car"}, "ignore": {"van"}},
    "pedestrian": {"main": {"pedestrian"}, "ignore": {"person_sitting"}},
}
MIN_OVERLAP = 0.5


def load_kitti_labels(path: str):
    """-> {frame: list of (track_id, type, bbox_xywh)}"""
    frames = defaultdict(list)
    if not os.path.exists(path):
        return frames
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 10:
                continue
            frame = int(float(parts[0]))
            tid = int(float(parts[1]))
            typ = parts[2].lower()
            x1, y1, x2, y2 = map(float, parts[6:10])
            score = float(parts[17]) if len(parts) > 17 else 1.0
            frames[frame].append(
                (tid, typ, np.array([x1, y1, x2 - x1, y2 - y1]), score))
    return frames


def _filter_frame(gt_objs, hyp_objs, cls_spec):
    """Apply KITTI ignore semantics for one class on one frame."""
    main, ignore = cls_spec["main"], cls_spec["ignore"]
    gt_ids, gt_boxes = [], []
    ignore_boxes = []
    for tid, typ, box, _ in gt_objs:
        if typ in main:
            gt_ids.append(tid)
            gt_boxes.append(box)
        elif typ in ignore or typ == "dontcare":
            ignore_boxes.append(box)
    hyp_ids, hyp_boxes = [], []
    for tid, typ, box, _ in hyp_objs:
        if typ not in main:
            continue
        hyp_ids.append(tid)
        hyp_boxes.append(box)
    # absorb dets overlapping ignore/DontCare regions (not matched to gt)
    if ignore_boxes and hyp_boxes:
        gt_arr = np.array(gt_boxes).reshape(-1, 4)
        hyp_arr = np.array(hyp_boxes).reshape(-1, 4)
        ign_arr = np.array(ignore_boxes).reshape(-1, 4)
        iou_gt = iou_xywh(hyp_arr, gt_arr) if len(gt_boxes) else \
            np.zeros((len(hyp_boxes), 0))
        iou_ig = iou_xywh(hyp_arr, ign_arr)
        keep = []
        for i in range(len(hyp_boxes)):
            matches_gt = len(gt_boxes) and iou_gt[i].max() >= MIN_OVERLAP
            in_ignore = iou_ig[i].max() >= MIN_OVERLAP
            if in_ignore and not matches_gt:
                continue
            keep.append(i)
        hyp_ids = [hyp_ids[i] for i in keep]
        hyp_boxes = [hyp_boxes[i] for i in keep]
    return gt_ids, gt_boxes, hyp_ids, hyp_boxes


def read_seqmap(path: str):
    """seqmap lines: '0000 empty 000000 000154' -> [(seq, first, last)]"""
    seqs = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 4:
                seqs.append((parts[0], int(parts[2]), int(parts[3])))
    return seqs


def evaluate_kitti_tracking(results_dir: str, dataset_version: str = "",
                            gt_dir: Optional[str] = None,
                            seqmap_path: Optional[str] = None
                            ) -> Dict[str, Dict]:
    """Evaluate result txts (one per sequence) against the GT fixtures.

    dataset_version 'val_half'/'train_half' selects fixtures the same way
    the reference CLI does (evaluate_tracking.py seqmap handling).
    """
    if gt_dir is None:
        suffix = {"val_half": "_val_half", "train_half": "_train_half"
                  }.get(dataset_version, "")
        gt_dir = os.path.join(FIXTURE_DIR, f"label_02{suffix}")
    if seqmap_path is None:
        name = {"val_half": "evaluate_trackingval_half.seqmap",
                "train_half": "evaluate_trackingtrain_half.seqmap"
                }.get(dataset_version, "evaluate_tracking.seqmap")
        seqmap_path = os.path.join(FIXTURE_DIR, name)
        if not os.path.exists(seqmap_path):
            seqmap_path = os.path.join(FIXTURE_DIR,
                                       "evaluate_tracking.seqmap")

    seqs = read_seqmap(seqmap_path)
    out = {}
    for cls_name, cls_spec in CLASSES.items():
        accs, summary = {}, {}
        for seq, first, last in seqs:
            gt_path = os.path.join(gt_dir, f"{seq}.txt")
            res_path = os.path.join(results_dir, f"{seq}.txt")
            if not os.path.exists(gt_path):
                continue
            gt = load_kitti_labels(gt_path)
            ts = load_kitti_labels(res_path)
            acc = MOTAccumulator()
            for f in range(first, last + 1):
                gt_ids, gt_boxes, hyp_ids, hyp_boxes = _filter_frame(
                    gt.get(f, []), ts.get(f, []), cls_spec)
                acc.update(gt_ids, np.array(gt_boxes).reshape(-1, 4),
                           hyp_ids, np.array(hyp_boxes).reshape(-1, 4))
            accs[seq] = acc
            summary[seq] = acc.metrics()
        if accs:
            overall = combine_metrics(summary, accs)
            out[cls_name] = overall
            print(f"[kitti-tracking {cls_name}] MOTA {overall['mota']:.4f}"
                  f" MOTP {1 - overall['motp']:.4f}"
                  f" IDSW {overall['num_switches']}"
                  f" FP {overall['num_false_positives']}"
                  f" FN {overall['num_misses']}")
    return out
