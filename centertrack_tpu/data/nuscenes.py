"""nuScenes monocular-3D detection/tracking dataset
(reference: src/lib/dataset/datasets/nuscenes.py).

The camera-frame -> global-frame box lifting that the reference does via
pyquaternion + nuscenes-devkit Box objects (nuscenes.py:96-194) is done
here with a minimal numpy quaternion implementation, keeping the output
json format identical (nuScenes submission schema).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from centertrack_tpu.data.generic import GenericDataset
from centertrack_tpu.data.datasets import cfg_data_dir


class Quat:
    """Minimal wxyz quaternion."""

    def __init__(self, wxyz=None, axis=None, angle=None):
        if wxyz is not None:
            self.q = np.asarray(wxyz, np.float64)
        else:
            axis = np.asarray(axis, np.float64)
            axis = axis / np.linalg.norm(axis)
            half = angle / 2.0
            self.q = np.concatenate([[np.cos(half)], np.sin(half) * axis])

    def __mul__(self, other: "Quat") -> "Quat":
        w1, x1, y1, z1 = self.q
        w2, x2, y2, z2 = other.q
        return Quat([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ])

    def rotate(self, v: np.ndarray) -> np.ndarray:
        w, x, y, z = self.q
        r = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
             2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
             2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x),
             1 - 2 * (x * x + y * y)],
        ])
        return r @ np.asarray(v, np.float64)


class NuScenes(GenericDataset):
    default_resolution = [448, 800]
    num_categories = 10
    class_name = [
        'car', 'truck', 'bus', 'trailer',
        'construction_vehicle', 'pedestrian', 'motorcycle', 'bicycle',
        'traffic_cone', 'barrier']
    cat_ids = {i + 1: i + 1 for i in range(10)}
    focal_length = 1200
    max_objs = 128
    _tracking_ignored_class = ['construction_vehicle', 'traffic_cone',
                               'barrier']
    _vehicles = ['car', 'truck', 'bus', 'trailer', 'construction_vehicle']
    _cycles = ['motorcycle', 'bicycle']
    _pedestrians = ['pedestrian']
    attribute_to_id = {
        '': 0, 'cycle.with_rider': 1, 'cycle.without_rider': 2,
        'pedestrian.moving': 3, 'pedestrian.standing': 4,
        'pedestrian.sitting_lying_down': 5,
        'vehicle.moving': 6, 'vehicle.parked': 7,
        'vehicle.stopped': 8}
    id_to_attribute = {v: k for k, v in attribute_to_id.items()}

    def __init__(self, cfg, split):
        data_dir = os.path.join(cfg_data_dir(cfg), "nuscenes")
        img_dir = os.path.join(data_dir, "v1.0-trainval")
        if cfg.dataset_version == "test":
            ann_path = os.path.join(data_dir, "annotations", "test.json")
            img_dir = os.path.join(data_dir, "v1.0-test")
        else:
            ann_path = os.path.join(
                data_dir, "annotations",
                f"{cfg.dataset_version}{split}.json")
        super().__init__(cfg, split, ann_path, img_dir)
        self.alpha_in_degree = False

    def _to_float(self, x):
        return float(f"{x:.2f}")

    def convert_eval_format(self, results) -> Dict:
        """Camera-frame detections -> global-frame nuScenes submission
        (reference: nuscenes.py:96-194)."""
        ret = {"meta": {"use_camera": True, "use_lidar": False,
                        "use_radar": False, "use_map": False,
                        "use_external": False}, "results": {}}
        for image_id in self.images:
            if image_id not in results:
                continue
            image_info = self.coco.loadImgs([image_id])[0]
            sample_token = image_info["sample_token"]
            trans_matrix = np.array(image_info["trans_matrix"], np.float32)
            sensor_id = image_info["sensor_id"]
            sample_results = []
            for item in results[image_id]:
                class_name = (self.class_name[int(item["class"] - 1)]
                              if "detection_name" not in item
                              else item["detection_name"])
                if self.cfg.tracking and \
                        class_name in self._tracking_ignored_class:
                    continue
                score = (float(item["score"])
                         if "detection_score" not in item
                         else item["detection_score"])
                if "size" in item:
                    size = item["size"]
                else:
                    size = [float(item["dim"][1]), float(item["dim"][2]),
                            float(item["dim"][0])]
                if "translation" in item:
                    translation = item["translation"]
                else:
                    translation = trans_matrix @ np.array(
                        [item["loc"][0], item["loc"][1] - size[2],
                         item["loc"][2], 1], np.float32)

                det_id = item.get("det_id", -1)
                tracking_id = item.get("tracking_id", 1)

                if "rotation" not in item:
                    # Box center/orientation lift: camera -> ego -> global
                    # (the reference's devkit Box.translate/rotate chain,
                    # nuscenes.py:131-144). Only the orientation is needed
                    # here since translation uses trans_matrix directly.
                    rot_cam = Quat(axis=[0, 1, 0], angle=item["rot_y"])
                    q = Quat(image_info["pose_record_rot"]) * (
                        Quat(image_info["cs_record_rot"]) * rot_cam)
                    rotation = [float(v) for v in q.q]
                else:
                    rotation = item["rotation"]

                nuscenes_att = (np.array(item["nuscenes_att"], np.float32)
                                if "nuscenes_att" in item
                                else np.zeros(8, np.float32))
                att = ""
                if class_name in self._cycles:
                    att = self.id_to_attribute[
                        int(np.argmax(nuscenes_att[0:2])) + 1]
                elif class_name in self._pedestrians:
                    att = self.id_to_attribute[
                        int(np.argmax(nuscenes_att[2:5])) + 3]
                elif class_name in self._vehicles:
                    att = self.id_to_attribute[
                        int(np.argmax(nuscenes_att[5:8])) + 6]
                if "velocity" in item and len(item["velocity"]) == 2:
                    velocity = item["velocity"]
                else:
                    velocity = item.get("velocity", [0, 0, 0])
                    velocity = trans_matrix @ np.array(
                        [velocity[0], velocity[1], velocity[2], 0],
                        np.float32)
                    velocity = [float(velocity[0]), float(velocity[1])]
                sample_results.append({
                    "sample_token": sample_token,
                    "translation": [float(translation[0]),
                                    float(translation[1]),
                                    float(translation[2])],
                    "size": size,
                    "rotation": rotation,
                    "velocity": velocity,
                    "detection_name": class_name,
                    "attribute_name": item.get("attribute_name", att),
                    "detection_score": score,
                    "tracking_name": class_name,
                    "tracking_score": score,
                    "tracking_id": tracking_id,
                    "sensor_id": sensor_id,
                    "det_id": det_id,
                })
            if sample_token in ret["results"]:
                ret["results"][sample_token] += sample_results
            else:
                ret["results"][sample_token] = sample_results

        # keep top-500 per sample by detection score (nuscenes.py:188-192)
        for sample_token in ret["results"]:
            dets = ret["results"][sample_token]
            confs = sorted([(-d["detection_score"], ind)
                            for ind, d in enumerate(dets)])
            ret["results"][sample_token] = [
                dets[ind] for _, ind in confs[:min(500, len(confs))]]
        return ret

    def save_results(self, results, save_dir, task):
        path = os.path.join(save_dir, f"results_nuscenes_{task}.json")
        with open(path, "w") as f:
            json.dump(self.convert_eval_format(results), f)
        return path

    def _gt_global(self):
        """Lift the COCO-format GT annotations (camera frame, from
        tools/convert_nuscenes.py) to global-frame box dicts with the
        SAME transform chain convert_eval_format applies to
        predictions, so evaluator matching is consistent. Returns
        (gt: sample_token -> [box], scenes: ordered token lists).

        Instances visible from several cameras are deduplicated per
        sample (by track_id when present, else by global position).
        """
        gt: Dict[str, List[dict]] = {}
        seen: Dict[str, set] = {}
        frames = []  # (video_id, frame_id, sample_token)
        for image_id in self.images:
            info = self.coco.loadImgs([image_id])[0]
            token = info["sample_token"]
            trans_matrix = np.array(info["trans_matrix"], np.float32)
            frames.append((info.get("video_id", 0),
                           info.get("frame_id", 0), token))
            gt.setdefault(token, [])
            seen.setdefault(token, set())
            for ann in self.coco.loadAnns(
                    self.coco.getAnnIds(imgIds=[image_id])):
                cat = int(ann["category_id"])
                if cat <= 0 or cat > self.num_categories:
                    continue
                name = self.class_name[cat - 1]
                if "location" not in ann or "dim" not in ann:
                    continue
                loc = np.asarray(ann["location"], np.float32)
                dim = [float(d) for d in ann["dim"]]  # h, w, l
                size = [dim[1], dim[2], dim[0]]
                translation = trans_matrix @ np.array(
                    [loc[0], loc[1] - size[2], loc[2], 1], np.float32)
                rot_cam = Quat(axis=[0, 1, 0],
                               angle=float(ann.get("rotation_y", 0.0)))
                q = Quat(info["pose_record_rot"]) * (
                    Quat(info["cs_record_rot"]) * rot_cam)
                from centertrack_tpu.eval.nuscenes_eval import quat_to_yaw
                if "track_id" in ann:
                    key = ("t", ann["track_id"])
                    if key in seen[token]:
                        continue
                    seen[token].add(key)
                else:
                    # No track_id: a multi-camera duplicate reprojects
                    # to nearly the same global position, so dedup by
                    # nearest neighbor of the same class within 1 m
                    # (rounded-cell equality both double-counts real
                    # duplicates landing in different 0.1 m cells and
                    # merges distinct objects sharing a cell).
                    tx, ty = float(translation[0]), float(translation[1])
                    if any(g["detection_name"] == name and
                           (g["translation"][0] - tx) ** 2 +
                           (g["translation"][1] - ty) ** 2 < 1.0
                           for g in gt[token]):
                        continue
                vel = [0.0, 0.0]
                v_cam = ann.get("velocity", None)
                if v_cam is not None and len(v_cam) >= 3 and \
                        min(v_cam[:3]) > -1000:
                    vg = trans_matrix @ np.array(
                        [v_cam[0], v_cam[1], v_cam[2], 0], np.float32)
                    vel = [float(vg[0]), float(vg[1])]
                gt[token].append({
                    "translation": [float(v) for v in translation[:3]],
                    "size": size,
                    "yaw": quat_to_yaw(q.q),
                    "velocity": vel,
                    "attribute_name": self.id_to_attribute.get(
                        int(ann.get("attributes", 0)), ""),
                    "detection_name": name,
                    "tracking_name": name,
                    "tracking_id": ann.get("track_id", 0),
                })
        # scene structure: unique tokens per video, frame-ordered
        frames.sort()
        scenes: Dict[int, List[str]] = {}
        for vid, _, token in frames:
            toks = scenes.setdefault(vid, [])
            if not toks or toks[-1] != token:
                toks.append(token)
        return gt, list(scenes.values())

    def run_eval(self, results, save_dir):
        """Hermetic nuScenes evaluation: writes the submission json AND
        computes mAP (detection) or AMOTA/AMOTP (tracking) in-process
        (reference: nuscenes.py:202-221 shells out to the devkit)."""
        from centertrack_tpu.eval.nuscenes_eval import (
            detection_metrics, quat_to_yaw, tracking_metrics)
        task = "tracking" if self.cfg.tracking else "det"
        path = self.save_results(results, save_dir, task)
        with open(path) as f:
            submission = json.load(f)["results"]
        pred: Dict[str, List[dict]] = {}
        for token, boxes in submission.items():
            pred[token] = []
            for b in boxes:
                b = dict(b)
                b["yaw"] = quat_to_yaw(b["rotation"])
                pred[token].append(b)
        gt, scenes = self._gt_global()
        if self.cfg.tracking:
            metrics = tracking_metrics(scenes, gt, pred)
            print(f"nuScenes tracking: AMOTA {metrics['amota']:.4f} "
                  f"AMOTP {metrics['amotp']:.4f}")
        else:
            metrics = detection_metrics(gt, pred, self.class_name)
            print(f"nuScenes detection: mAP {metrics['mean_ap']:.4f} "
                  f"NDS {metrics['nds']:.4f}")
        out_path = os.path.join(save_dir, f"metrics_nuscenes_{task}.json")
        with open(out_path, "w") as f:
            json.dump(metrics, f, indent=2, default=float)
        return metrics
