"""COCO bbox mAP evaluation (pycocotools COCOeval protocol).

pycocotools is absent in this environment; this implements the standard
bbox evaluation — IoU thresholds .5:.05:.95, 101-point interpolated PR,
area ranges, maxDets 100, crowd-region handling — against the minimal
COCO index in data/coco_api.py.
(reference consumer: src/lib/dataset/datasets/coco.py:104-110)
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Dict, List

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = {
    "all": [0, 1e10],
    "small": [0, 32 ** 2],
    "medium": [32 ** 2, 96 ** 2],
    "large": [96 ** 2, 1e10],
}
MAX_DETS = 100


def _iou_xywh_crowd(dets: np.ndarray, gts: np.ndarray,
                    iscrowd: np.ndarray) -> np.ndarray:
    """IoU with crowd semantics: for crowd gt, intersection over det
    area (pycocotools maskUtils.iou)."""
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)))
    dx1, dy1 = dets[:, 0], dets[:, 1]
    dx2, dy2 = dets[:, 0] + dets[:, 2], dets[:, 1] + dets[:, 3]
    gx1, gy1 = gts[:, 0], gts[:, 1]
    gx2, gy2 = gts[:, 0] + gts[:, 2], gts[:, 1] + gts[:, 3]
    ix1 = np.maximum(dx1[:, None], gx1[None, :])
    iy1 = np.maximum(dy1[:, None], gy1[None, :])
    ix2 = np.minimum(dx2[:, None], gx2[None, :])
    iy2 = np.minimum(dy2[:, None], gy2[None, :])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    d_area = (dets[:, 2] * dets[:, 3])[:, None]
    g_area = (gts[:, 2] * gts[:, 3])[None, :]
    union = np.where(iscrowd[None, :].astype(bool), d_area,
                     d_area + g_area - inter)
    return inter / np.maximum(union, 1e-9)


KPT_SIGMAS = np.array([
    .26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
    1.07, 1.07, .87, .87, .89, .89]) / 10.0


def oks_matrix(dets: List[Dict], gts: List[Dict]) -> np.ndarray:
    """Object-keypoint-similarity matrix (pycocotools computeOks)."""
    if not dets or not gts:
        return np.zeros((len(dets), len(gts)))
    out = np.zeros((len(dets), len(gts)))
    vars_ = (KPT_SIGMAS * 2) ** 2
    for gi, g in enumerate(gts):
        gk = np.array(g["keypoints"]).reshape(-1, 3)
        xg, yg, vg = gk[:, 0], gk[:, 1], gk[:, 2]
        k1 = (vg > 0).sum()
        bb = g["bbox"]
        x0, x1 = bb[0] - bb[2], bb[0] + 2 * bb[2]
        y0, y1 = bb[1] - bb[3], bb[1] + 2 * bb[3]
        area = g.get("area", bb[2] * bb[3])
        for di, d in enumerate(dets):
            dk = np.array(d["keypoints"]).reshape(-1, 3)
            xd, yd = dk[:, 0], dk[:, 1]
            if k1 > 0:
                dx = xd - xg
                dy = yd - yg
            else:
                dx = np.maximum(0, np.maximum(x0 - xd, xd - x1))
                dy = np.maximum(0, np.maximum(y0 - yd, yd - y1))
            e = (dx ** 2 + dy ** 2) / vars_ / (area + np.spacing(1)) / 2
            if k1 > 0:
                e = e[vg > 0]
            out[di, gi] = np.sum(np.exp(-e)) / e.shape[0]
    return out


def evaluate_coco_keypoints(coco_gt, res_path_or_list,
                            verbose: bool = True) -> Dict[str, float]:
    """COCO keypoint AP (OKS thresholds .5:.05:.95, maxDets 20,
    area ranges all/medium/large) — the coco_hp evaluator
    (reference consumer: src/lib/dataset/datasets/coco_hp.py:94-107).
    """
    if isinstance(res_path_or_list, str):
        with open(res_path_or_list) as f:
            dets_list = json.load(f)
    else:
        dets_list = res_path_or_list
    dets_by = defaultdict(list)
    for d in dets_list:
        if "keypoints" in d:
            dets_by[d["image_id"]].append(d)
    gts_by = defaultdict(list)
    for ann in coco_gt.anns.values():
        if ann.get("num_keypoints",
                   int((np.array(ann.get("keypoints", [])).reshape(
                       -1, 3)[:, 2] > 0).sum()
                       if ann.get("keypoints") else 0)) >= 0 \
                and "keypoints" in ann:
            gts_by[ann["image_id"]].append(ann)

    area_rng = {"all": [0, 1e10], "medium": [32 ** 2, 96 ** 2],
                "large": [96 ** 2, 1e10]}
    T = len(IOU_THRS)
    R = len(REC_THRS)
    precisions = -np.ones((T, R, len(area_rng)))
    for ai, (aname, arng) in enumerate(area_rng.items()):
        scores_all, matched_all = [], {ti: [] for ti in range(T)}
        ignored_all = {ti: [] for ti in range(T)}
        n_gt = 0
        for img in sorted(coco_gt.imgs.keys()):
            gts = gts_by.get(img, [])
            dts = sorted(dets_by.get(img, []),
                         key=lambda d: -d["score"])[:20]
            if not gts and not dts:
                continue
            g_ignore = np.array([
                (g.get("iscrowd", 0) == 1) or
                (np.array(g["keypoints"]).reshape(-1, 3)[:, 2]
                 > 0).sum() == 0 or
                not (arng[0] <= g.get(
                    "area", g["bbox"][2] * g["bbox"][3]) <= arng[1])
                for g in gts], bool) if gts else np.zeros(0, bool)
            n_gt += int((~g_ignore).sum())
            if not dts:
                continue
            ious = oks_matrix(dts, gts)
            g_order = np.argsort(g_ignore.astype(int), kind="stable")
            scores_all.append(np.array([d["score"] for d in dts]))
            for ti, thr in enumerate(IOU_THRS):
                taken = np.zeros(len(gts), bool)
                d_match = np.zeros(len(dts), np.int64)
                d_ig = np.zeros(len(dts), bool)
                for di in range(len(dts)):
                    best, best_iou = -1, min(thr, 1 - 1e-10)
                    for gi in g_order:
                        if taken[gi] and not gts[gi].get("iscrowd", 0):
                            continue
                        if (best > -1 and not g_ignore[best]
                                and g_ignore[gi]):
                            break
                        if ious[di, gi] < best_iou:
                            continue
                        best_iou = ious[di, gi]
                        best = gi
                    if best > -1:
                        taken[best] = True
                        d_match[di] = 1
                        d_ig[di] = g_ignore[best]
                matched_all[ti].append(d_match)
                ignored_all[ti].append(d_ig)
        if n_gt == 0 or not scores_all:
            continue
        scores = np.concatenate(scores_all)
        order = np.argsort(-scores, kind="mergesort")
        for ti in range(T):
            tm = np.concatenate(matched_all[ti])[order]
            ig = np.concatenate(ignored_all[ti])[order]
            tp = np.cumsum((tm == 1) & ~ig)
            fp = np.cumsum((tm == 0) & ~ig)
            rc = tp / n_gt
            pr = tp / np.maximum(tp + fp, 1e-9)
            for i in range(len(pr) - 1, 0, -1):
                pr[i - 1] = max(pr[i - 1], pr[i])
            inds = np.searchsorted(rc, REC_THRS, side="left")
            q = np.zeros(R)
            for ri, pi in enumerate(inds):
                if pi < len(pr):
                    q[ri] = pr[pi]
            precisions[ti, :, ai] = q

    def _ap(t=None, a="all"):
        ai = list(area_rng).index(a)
        p = (precisions[:, :, ai] if t is None else
             precisions[[list(IOU_THRS).index(t)], :, ai])
        p = p[p > -1]
        return float(p.mean()) if p.size else -1.0

    stats = {"AP": _ap(), "AP50": _ap(0.5), "AP75": _ap(0.75),
             "APm": _ap(a="medium"), "APl": _ap(a="large")}
    if verbose:
        for k, v in stats.items():
            print(f" kpt {k}: {v:.3f}")
    return stats


def evaluate_coco_bbox(coco_gt, res_path_or_list,
                       verbose: bool = True) -> Dict[str, float]:
    """Returns the 12 standard COCO metrics as a dict; prints the usual
    summary lines."""
    if isinstance(res_path_or_list, str):
        with open(res_path_or_list) as f:
            dets_list = json.load(f)
    else:
        dets_list = res_path_or_list

    cat_ids = sorted(coco_gt.cats.keys())
    img_ids = sorted(coco_gt.imgs.keys())
    dets_by = defaultdict(list)
    for d in dets_list:
        dets_by[(d["image_id"], d["category_id"])].append(d)
    gts_by = defaultdict(list)
    for ann in coco_gt.anns.values():
        gts_by[(ann["image_id"], ann["category_id"])].append(ann)

    T, R = len(IOU_THRS), len(REC_THRS)
    # evalImgs[(cat, area)][img] -> per-det matches
    # accumulate precision[T, R, K, A]
    precisions = -np.ones((T, R, len(cat_ids), len(AREA_RNG)))
    recalls = -np.ones((T, len(cat_ids), len(AREA_RNG)))

    for ki, cat in enumerate(cat_ids):
        for ai, (aname, arng) in enumerate(AREA_RNG.items()):
            # gather matches over all images
            all_scores = []
            all_matched = []   # [T, n_dets] gt id matched or 0
            all_ignored = []   # [T, n_dets]
            n_gt = 0
            for img in img_ids:
                gts = gts_by.get((img, cat), [])
                dts = sorted(dets_by.get((img, cat), []),
                             key=lambda d: -d["score"])[:MAX_DETS]
                if len(gts) == 0 and len(dts) == 0:
                    continue
                g_boxes = np.array([g["bbox"] for g in gts],
                                   np.float64).reshape(-1, 4)
                g_crowd = np.array(
                    [g.get("iscrowd", 0) for g in gts], bool)
                g_area = np.array(
                    [g.get("area", g["bbox"][2] * g["bbox"][3])
                     for g in gts], np.float64)
                g_ignore = g_crowd | (g_area < arng[0]) | (g_area > arng[1])
                n_gt += int((~g_ignore).sum())
                d_boxes = np.array([d["bbox"] for d in dts],
                                   np.float64).reshape(-1, 4)
                d_area = d_boxes[:, 2] * d_boxes[:, 3]
                ious = _iou_xywh_crowd(d_boxes, g_boxes, g_crowd)

                # sort gt: non-ignored first (pycocotools order)
                g_order = np.argsort(g_ignore.astype(int), kind="stable")
                for ti, thr in enumerate(IOU_THRS):
                    g_matched = np.zeros(len(gts), bool)
                    d_match = np.zeros(len(dts), np.int64)
                    d_ignore = np.zeros(len(dts), bool)
                    for di in range(len(dts)):
                        best, best_iou = -1, min(thr, 1 - 1e-10)
                        for gi in g_order:
                            if g_matched[gi] and not g_crowd[gi]:
                                continue
                            # once matched to a real gt, stop when
                            # reaching ignored gts (pycocotools order)
                            if (best > -1 and not g_ignore[best]
                                    and g_ignore[gi]):
                                break
                            if ious[di, gi] < best_iou:
                                continue
                            best_iou = ious[di, gi]
                            best = gi
                        if best > -1:
                            g_matched[best] = True
                            d_match[di] = 1
                            d_ignore[di] = g_ignore[best]
                    # unmatched dets outside area range are ignored
                    out_rng = (d_area < arng[0]) | (d_area > arng[1])
                    d_ignore |= (d_match == 0) & out_rng
                    if ti == 0:
                        all_scores.append(
                            np.array([d["score"] for d in dts]))
                    all_matched.append((ti, len(all_scores) - 1, d_match))
                    all_ignored.append((ti, len(all_scores) - 1, d_ignore))

            if n_gt == 0:
                continue
            if not all_scores:
                continue
            scores = np.concatenate(all_scores)
            order = np.argsort(-scores, kind="mergesort")
            n_det_imgs = len(all_scores)
            for ti in range(T):
                tm = np.concatenate(
                    [m for (t, i, m) in all_matched if t == ti])
                ig = np.concatenate(
                    [m for (t, i, m) in all_ignored if t == ti])
                tm, ig = tm[order], ig[order]
                tp = (tm == 1) & ~ig
                fp = (tm == 0) & ~ig
                tp_cum = np.cumsum(tp)
                fp_cum = np.cumsum(fp)
                rc = tp_cum / n_gt
                pr = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
                # make precision monotonically decreasing
                for i in range(len(pr) - 1, 0, -1):
                    pr[i - 1] = max(pr[i - 1], pr[i])
                inds = np.searchsorted(rc, REC_THRS, side="left")
                q = np.zeros(R)
                for ri, pi in enumerate(inds):
                    if pi < len(pr):
                        q[ri] = pr[pi]
                precisions[ti, :, ki, ai] = q
                recalls[ti, ki, ai] = rc[-1] if len(rc) else 0

    def _ap(t=None, a="all"):
        ai = list(AREA_RNG).index(a)
        p = precisions[:, :, :, ai] if t is None else \
            precisions[[list(IOU_THRS).index(t)], :, :, ai]
        p = p[p > -1]
        return float(p.mean()) if p.size else -1.0

    def _ar(a="all"):
        ai = list(AREA_RNG).index(a)
        r = recalls[:, :, ai]
        r = r[r > -1]
        return float(r.mean()) if r.size else -1.0

    stats = {
        "AP": _ap(), "AP50": _ap(0.5), "AP75": _ap(0.75),
        "APs": _ap(a="small"), "APm": _ap(a="medium"),
        "APl": _ap(a="large"),
        "AR": _ar(), "ARs": _ar("small"), "ARm": _ar("medium"),
        "ARl": _ar("large"),
    }
    if verbose:
        for k, v in stats.items():
            print(f" {k}: {v:.3f}")
    return stats
