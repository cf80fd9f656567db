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
