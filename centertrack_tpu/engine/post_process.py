"""Map decoded output-grid detections to original-image coordinates
(reference: src/lib/utils/post_process.py).

Host-side numpy: operates on the small (B, K, ...) arrays produced by the
fused on-device decode. Vectorized over K where the reference loops.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from centertrack_tpu.ops.affine import (get_affine_transform,
                                        transform_preds_with_trans)
from centertrack_tpu.utils.ddd import ddd2locrot


def get_alpha(rot: np.ndarray) -> np.ndarray:
    """8-bin rot vector -> observation angle alpha
    (reference: post_process.py:12-19). rot: (N, 8)."""
    idx = rot[:, 1] > rot[:, 5]
    alpha1 = np.arctan2(rot[:, 2], rot[:, 3]) + (-0.5 * np.pi)
    alpha2 = np.arctan2(rot[:, 6], rot[:, 7]) + (0.5 * np.pi)
    return alpha1 * idx + alpha2 * (1 - idx)


def generic_post_process(cfg, dets: Dict[str, np.ndarray], c, s,
                         h: int, w: int, calibs=None) -> List[List[Dict]]:
    """(reference: post_process.py:21-91)

    Args:
      dets: dict of (B, K, ...) numpy arrays from generic_decode.
      c, s: per-image center/scale used at pre-process time.
      h, w: output grid height/width.
    Returns per-image lists of per-detection dicts in image coords.
    """
    if "scores" not in dets:
        return [{}]
    ret = []
    for i in range(len(dets["scores"])):
        preds = []
        trans = get_affine_transform(
            c[i], s[i], 0, (w, h), inv=1).astype(np.float32)
        for j in range(len(dets["scores"][i])):
            if dets["scores"][i][j] < cfg.out_thresh:
                break  # scores are sorted; early stop (reference :31-33)
            item = {}
            item["score"] = float(dets["scores"][i][j])
            item["class"] = int(dets["clses"][i][j]) + 1
            item["ct"] = transform_preds_with_trans(
                dets["cts"][i][j].reshape(1, 2), trans).reshape(2)

            if "tracking" in dets:
                tracking = transform_preds_with_trans(
                    (dets["tracking"][i][j] + dets["cts"][i][j]).reshape(1, 2),
                    trans).reshape(2)
                item["tracking"] = tracking - item["ct"]

            if "bboxes" in dets:
                bbox = transform_preds_with_trans(
                    dets["bboxes"][i][j].reshape(2, 2), trans).reshape(4)
                item["bbox"] = bbox

            if "hps" in dets:
                pts = transform_preds_with_trans(
                    dets["hps"][i][j].reshape(-1, 2), trans).reshape(-1)
                item["hps"] = pts

            if "dep" in dets and len(dets["dep"][i]) > j:
                item["dep"] = dets["dep"][i][j]
            if "dim" in dets and len(dets["dim"][i]) > j:
                item["dim"] = dets["dim"][i][j]
            if "rot" in dets and len(dets["rot"][i]) > j:
                item["alpha"] = get_alpha(dets["rot"][i][j:j + 1])[0]

            if ("rot" in dets and "dep" in dets and "dim" in dets
                    and len(dets["dep"][i]) > j):
                if "amodel_offset" in dets and len(
                        dets["amodel_offset"][i]) > j:
                    ct_output = dets["bboxes"][i][j].reshape(2, 2).mean(axis=0)
                    amodel_ct_output = ct_output + dets["amodel_offset"][i][j]
                    ct = transform_preds_with_trans(
                        amodel_ct_output.reshape(1, 2),
                        trans).reshape(2).tolist()
                else:
                    bbox = item["bbox"]
                    ct = [(bbox[0] + bbox[2]) / 2, (bbox[1] + bbox[3]) / 2]
                item["ct"] = ct
                item["loc"], item["rot_y"] = ddd2locrot(
                    ct, item["alpha"], item["dim"], item["dep"], calibs[i])

            preds.append(item)

        if "nuscenes_att" in dets:
            for j in range(len(preds)):
                preds[j]["nuscenes_att"] = dets["nuscenes_att"][i][j]
        if "velocity" in dets:
            for j in range(len(preds)):
                preds[j]["velocity"] = dets["velocity"][i][j]
        ret.append(preds)
    return ret
