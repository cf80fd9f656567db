"""Hermetic nuScenes detection mAP + tracking AMOTA/AMOTP.

Implements the nuscenes-devkit algorithms the reference shells out to
(reference: src/lib/dataset/datasets/nuscenes.py:202-221, which runs
``nuscenes-devkit/.../evaluate.py`` as a subprocess), so `run_eval`
returns numbers without any external package or data download.

Detection (Caesar et al., "nuScenes: a multimodal dataset", CVPR 2020):
  per class and center-distance threshold d in {0.5, 1, 2, 4} m:
  predictions are matched greedily in score order to the nearest
  unmatched GT of the class on the ground plane; AP is the normalized
  mean of 101-point interpolated precision over recall in (0.1, 1]
  with precision baseline 0.1 subtracted. mAP averages classes and
  thresholds. True-positive errors (ATE/ASE/AOE/AVE/AAE) are measured
  at the 2 m threshold with the devkit's class exclusions (barrier:
  no velocity/attribute; traffic_cone: no orientation/velocity/
  attribute; barrier orientation on a 180-degree period) and the
  OFFICIAL devkit score
      NDS = (5*mAP + sum_5(1 - min(1, err))) / 10.
  A 3-error variant (`nds_3err`, the pre-round-3 number that ignored
  AVE/AAE) is kept only as a clearly-named fallback for result files
  that lack velocity/attribute fields.

Tracking (Weng & Kitani AB3DMOT AMOTA, as adopted by nuScenes):
  per class: a 40-point sweep of target recalls in [0.1, 1]; each
  target maps to the score threshold achieving it on the class's
  detection-style recall curve; CLEAR-MOT runs per scene at 2 m
  center distance and
      MOTAR = max(0, 1 - (IDS + FP + FN - (1 - r) * P) / (r * P))
  with r the achieved recall and P the GT count. AMOTA is the sweep
  mean of MOTAR (0 for unachievable recalls); AMOTP the sweep mean of
  the TP center distance (worst-case 2 m when unachievable).

Box format (plain dicts, the submission schema subset):
  translation: (x, y, z) global frame; size: (w, l, h); yaw: float;
  detection_name/tracking_name, detection_score/tracking_score,
  tracking_id (tracking only); velocity (optional, for AVE).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from centertrack_tpu.eval.mot_metrics import MOTAccumulator

DIST_THS = (0.5, 1.0, 2.0, 4.0)
TP_DIST_TH = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
N_RECALL_SWEEP = 40

TRACKING_CLASSES = ("bicycle", "bus", "car", "motorcycle", "pedestrian",
                    "trailer", "truck")


def _centers(boxes: List[dict]) -> np.ndarray:
    if not boxes:
        return np.zeros((0, 2), np.float64)
    return np.asarray([b["translation"][:2] for b in boxes], np.float64)


def _yaw_diff(a: float, b: float, period: float = 2 * np.pi) -> float:
    d = (a - b) % period
    if d > period / 2:
        d -= period
    return abs(d)


def _size_iou(a: Sequence[float], b: Sequence[float]) -> float:
    """3D IoU of two axis-aligned, center-aligned boxes (devkit's
    scale_iou): intersection of sizes / union."""
    sa = np.maximum(np.asarray(a, np.float64), 1e-9)
    sb = np.maximum(np.asarray(b, np.float64), 1e-9)
    inter = np.prod(np.minimum(sa, sb))
    union = np.prod(sa) + np.prod(sb) - inter
    return float(inter / union)


def _class_dets(pred: Dict[str, List[dict]], name: str,
                key: str) -> List[Tuple[float, str, dict]]:
    """All predictions of a class, score-sorted desc."""
    out = []
    for token, boxes in pred.items():
        for b in boxes:
            if b[f"{key}_name"] == name:
                out.append((float(b[f"{key}_score"]), token, b))
    out.sort(key=lambda t: -t[0])
    return out


# devkit per-class TP-metric exclusions (nuscenes-devkit
# eval/detection/algo.py calc_tp + configs: cones have no orientation,
# barriers/cones have no velocity or attributes; barrier orientation is
# 180-degree periodic)
NO_ORIENT = ("traffic_cone",)
NO_VEL = ("barrier", "traffic_cone")
NO_ATTR = ("barrier", "traffic_cone")
PERIOD_PI = ("barrier",)


def _greedy_match_curve(gt: Dict[str, List[dict]],
                        pred: Dict[str, List[dict]], name: str,
                        dist_th: float, key: str = "detection"):
    """Score-ordered greedy matching of one class at one threshold.

    Returns (tp flags, scores, match errors, npos): the devkit's
    accumulate() core. Each GT can be claimed once; a prediction takes
    the closest free GT of its sample if within dist_th. Each TP error
    entry is (trans_err, scale_err, orient_err, vel_err, attr_err)
    with NaN where the field is unavailable or excluded for the class.
    """
    npos = sum(1 for boxes in gt.values() for b in boxes
               if b[f"{key}_name"] == name)
    gt_by_token = {
        t: [b for b in boxes if b[f"{key}_name"] == name]
        for t, boxes in gt.items()}
    taken: Dict[str, set] = defaultdict(set)
    dets = _class_dets(pred, name, key)
    tp = np.zeros(len(dets), bool)
    scores = np.array([d[0] for d in dets], np.float64)
    errs = []
    period = np.pi if name in PERIOD_PI else 2 * np.pi
    for i, (score, token, box) in enumerate(dets):
        cands = gt_by_token.get(token, [])
        best_j, best_d = -1, dist_th
        c = np.asarray(box["translation"][:2], np.float64)
        for j, g in enumerate(cands):
            if j in taken[token]:
                continue
            d = float(np.linalg.norm(
                c - np.asarray(g["translation"][:2], np.float64)))
            if d < best_d:
                best_j, best_d = j, d
        if best_j >= 0:
            taken[token].add(best_j)
            tp[i] = True
            g = cands[best_j]
            if name in NO_ORIENT:
                oe = np.nan
            else:
                oe = _yaw_diff(float(box.get("yaw", 0.0)),
                               float(g.get("yaw", 0.0)), period)
            if name in NO_VEL or "velocity" not in box or \
                    "velocity" not in g:
                ve = np.nan
            else:
                ve = float(np.linalg.norm(
                    np.asarray(box["velocity"][:2], np.float64) -
                    np.asarray(g["velocity"][:2], np.float64)))
            if name in NO_ATTR or not g.get("attribute_name", ""):
                ae = np.nan
            else:
                ae = 0.0 if box.get("attribute_name", "") == \
                    g["attribute_name"] else 1.0
            errs.append((
                best_d,
                1.0 - _size_iou(box.get("size", (1, 1, 1)),
                                g.get("size", (1, 1, 1))),
                oe, ve, ae,
            ))
    return tp, scores, errs, npos


def _calc_ap(tp: np.ndarray, npos: int) -> float:
    """101-pt interpolated AP normalized above the (0.1, 0.1)
    recall/precision baselines (devkit calc_ap)."""
    if npos == 0 or len(tp) == 0:
        return 0.0
    tpc = np.cumsum(tp)
    fpc = np.cumsum(~tp)
    rec = tpc / npos
    prec = tpc / np.maximum(tpc + fpc, 1e-9)
    rec_interp = np.linspace(0, 1, 101)
    prec_i = np.interp(rec_interp, rec, prec, right=0)
    prec_i = prec_i[int(round(100 * MIN_RECALL)) + 1:]
    prec_i = np.maximum(prec_i - MIN_PRECISION, 0)
    return float(np.clip(np.mean(prec_i) / (1.0 - MIN_PRECISION),
                         0.0, 1.0))


def detection_metrics(gt: Dict[str, List[dict]],
                      pred: Dict[str, List[dict]],
                      class_names: Sequence[str],
                      dist_ths: Sequence[float] = DIST_THS) -> Dict:
    """nuScenes 3D detection metrics. gt/pred: sample_token -> boxes."""
    label_aps: Dict[str, Dict[float, float]] = {}
    tp_errors: Dict[str, Dict[str, float]] = {}
    keys = ("ate", "ase", "aoe", "ave", "aae")
    # devkit worst-case fill-ins when a class has zero TPs
    worst = {"ate": 1.0, "ase": 1.0, "aoe": np.pi, "ave": 1.0, "aae": 1.0}
    for name in class_names:
        if not any(b["detection_name"] == name
                   for boxes in gt.values() for b in boxes):
            continue  # class absent from GT: excluded from the mean
        label_aps[name] = {}
        for d in dist_ths:
            tp, _, errs, npos = _greedy_match_curve(gt, pred, name, d)
            label_aps[name][d] = _calc_ap(tp, npos)
            if d == TP_DIST_TH:
                excl = set()
                if name in NO_ORIENT:
                    excl.add("aoe")
                if name in NO_VEL:
                    excl.add("ave")
                if name in NO_ATTR:
                    excl.add("aae")
                e = np.asarray(errs, np.float64).reshape(-1, 5)
                cls_errs = {}
                for ki, k in enumerate(keys):
                    if k in excl:
                        cls_errs[k] = np.nan  # undefined for this class
                        continue
                    col = e[:, ki]
                    col = col[~np.isnan(col)]
                    cls_errs[k] = float(col.mean()) if len(col) else \
                        worst[k]
                tp_errors[name] = cls_errs
    mean_ap = float(np.mean([ap for c in label_aps.values()
                             for ap in c.values()])) if label_aps else 0.0
    mean_errs = {}
    for k in keys:
        vals = [tp_errors[c][k] for c in tp_errors
                if not np.isnan(tp_errors[c][k])]
        mean_errs[k] = float(np.mean(vals)) if vals else worst[k]
    # official devkit NDS over all five TP metrics
    # (reference consumes this number via the devkit subprocess,
    # src/lib/dataset/datasets/nuscenes.py:202-221)
    tp_score5 = sum(1.0 - min(1.0, mean_errs[k]) for k in keys)
    nds = (5.0 * mean_ap + tp_score5) / 10.0
    # legacy 3-error variant (rounds 1-2 reported this as "nds")
    tp_score3 = sum(1.0 - min(1.0, mean_errs[k])
                    for k in ("ate", "ase", "aoe"))
    nds_3err = (4.0 * mean_ap + tp_score3) / 7.0
    return {"mean_ap": mean_ap, "label_aps": label_aps,
            "tp_errors": tp_errors, "mean_errors": mean_errs,
            "nds": nds, "nds_3err": nds_3err}


# ----------------------------------------------------------------------
def _clear_at_threshold(gt_scenes: List[List[str]],
                        gt: Dict[str, List[dict]],
                        pred: Dict[str, List[dict]], name: str,
                        score_th: float, dist_th: float) -> Dict:
    """CLEAR-MOT for one class at one score threshold, 2 m center
    distance, accumulated over all scenes."""
    tp = fp = fn = ids = 0
    dist_sum = 0.0
    for scene in gt_scenes:
        acc = MOTAccumulator()
        for token in scene:
            gts = [b for b in gt.get(token, [])
                   if b["tracking_name"] == name]
            hyps = [b for b in pred.get(token, [])
                    if b["tracking_name"] == name
                    and float(b["tracking_score"]) >= score_th]
            g_cts = _centers(gts)
            h_cts = _centers(hyps)
            if len(gts) and len(hyps):
                d = np.linalg.norm(
                    g_cts[:, None, :] - h_cts[None, :, :], axis=2)
                d = np.where(d > dist_th, np.nan, d)
            else:
                d = np.zeros((len(gts), len(hyps)))
            acc.update([b["tracking_id"] for b in gts], None,
                       [b["tracking_id"] for b in hyps], None, dist=d)
        tp += acc.num_matches
        fp += acc.num_false_positives
        fn += acc.num_misses
        ids += acc.num_switches
        dist_sum += acc.dist_sum
    return {"tp": tp, "fp": fp, "fn": fn, "ids": ids,
            "motp": dist_sum / tp if tp else dist_th}


def tracking_metrics(gt_scenes: List[List[str]],
                     gt: Dict[str, List[dict]],
                     pred: Dict[str, List[dict]],
                     class_names: Sequence[str] = TRACKING_CLASSES,
                     dist_th: float = TP_DIST_TH,
                     n_sweep: int = N_RECALL_SWEEP) -> Dict:
    """nuScenes tracking metrics.

    gt_scenes: time-ordered sample tokens per scene. gt/pred:
    sample_token -> boxes (tracking schema).
    """
    per_class = {}
    for name in class_names:
        npos = sum(1 for boxes in gt.values() for b in boxes
                   if b["tracking_name"] == name)
        if npos == 0:
            continue
        # recall curve from detection-style greedy matching: maps each
        # target recall to the score threshold that achieves it
        tp_flags, scores, _, _ = _greedy_match_curve(
            gt, pred, name, dist_th, key="tracking")
        rec_curve = np.cumsum(tp_flags) / npos if len(tp_flags) else \
            np.zeros(0)
        targets = np.linspace(MIN_RECALL, 1.0, n_sweep)
        motars, motps = [], []
        best = {"mota": 0.0, "recall": 0.0}
        for r in targets:
            idx = np.searchsorted(rec_curve, r)
            if idx >= len(scores):  # unachievable recall
                motars.append(0.0)
                motps.append(dist_th)
                continue
            th = scores[idx]
            ev = _clear_at_threshold(
                gt_scenes, gt, pred, name, th, dist_th)
            rec = ev["tp"] / npos
            if rec <= 0:
                motars.append(0.0)
                motps.append(dist_th)
                continue
            motar = max(0.0, 1.0 - (ev["ids"] + ev["fp"] + ev["fn"]
                                    - (1.0 - rec) * npos) / (rec * npos))
            motars.append(motar)
            motps.append(ev["motp"])
            mota = max(0.0, 1.0 - (ev["ids"] + ev["fp"] + ev["fn"])
                       / npos)
            if mota >= best["mota"]:
                best = {"mota": mota, "recall": rec}
        per_class[name] = {
            "amota": float(np.mean(motars)) if motars else 0.0,
            "amotp": float(np.mean(motps)) if motps else dist_th,
            "mota": best["mota"],
        }
    if not per_class:
        return {"amota": 0.0, "amotp": dist_th, "per_class": {}}
    return {
        "amota": float(np.mean([c["amota"] for c in per_class.values()])),
        "amotp": float(np.mean([c["amotp"] for c in per_class.values()])),
        "mota": float(np.mean([c["mota"] for c in per_class.values()])),
        "per_class": per_class,
    }


def quat_to_yaw(wxyz: Sequence[float]) -> float:
    """Global-frame box quaternion -> yaw about +z."""
    w, x, y, z = [float(v) for v in wxyz]
    return float(np.arctan2(2.0 * (w * z + x * y),
                            1.0 - 2.0 * (y * y + z * z)))
