"""Concrete dataset classes + factory
(reference: src/lib/dataset/datasets/*.py, dataset_factory.py).

Evaluation (`run_eval`) is wired to this repo's own hermetic evaluators
(centertrack_tpu/eval/) — the reference shells out to pycocotools /
py-motmetrics / external C++ binaries, none of which exist here.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import numpy as np

from centertrack_tpu.data.generic import GenericDataset


class COCODet(GenericDataset):
    """80-class COCO detection (reference: datasets/coco.py)."""
    default_resolution = [512, 512]
    num_categories = 80
    class_name = [
        'person', 'bicycle', 'car', 'motorcycle', 'airplane',
        'bus', 'train', 'truck', 'boat', 'traffic light', 'fire hydrant',
        'stop sign', 'parking meter', 'bench', 'bird', 'cat', 'dog',
        'horse', 'sheep', 'cow', 'elephant', 'bear', 'zebra', 'giraffe',
        'backpack', 'umbrella', 'handbag', 'tie', 'suitcase', 'frisbee',
        'skis', 'snowboard', 'sports ball', 'kite', 'baseball bat',
        'baseball glove', 'skateboard', 'surfboard', 'tennis racket',
        'bottle', 'wine glass', 'cup', 'fork', 'knife', 'spoon', 'bowl',
        'banana', 'apple', 'sandwich', 'orange', 'broccoli', 'carrot',
        'hot dog', 'pizza', 'donut', 'cake', 'chair', 'couch',
        'potted plant', 'bed', 'dining table', 'toilet', 'tv', 'laptop',
        'mouse', 'remote', 'keyboard', 'cell phone', 'microwave', 'oven',
        'toaster', 'sink', 'refrigerator', 'book', 'clock', 'vase',
        'scissors', 'teddy bear', 'hair drier', 'toothbrush']
    _valid_ids = [
        1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13,
        14, 15, 16, 17, 18, 19, 20, 21, 22, 23,
        24, 25, 27, 28, 31, 32, 33, 34, 35, 36,
        37, 38, 39, 40, 41, 42, 43, 44, 46, 47,
        48, 49, 50, 51, 52, 53, 54, 55, 56, 57,
        58, 59, 60, 61, 62, 63, 64, 65, 67, 70,
        72, 73, 74, 75, 76, 77, 78, 79, 80, 81,
        82, 84, 85, 86, 87, 88, 89, 90]
    cat_ids = {v: i + 1 for i, v in enumerate(_valid_ids)}
    num_joints = 17
    max_objs = 128

    def __init__(self, cfg, split):
        data_dir = os.path.join(cfg_data_dir(cfg), "coco")
        img_dir = os.path.join(data_dir, f"{split}2017")
        ann_path = os.path.join(
            data_dir, "annotations", f"instances_{split}2017.json")
        super().__init__(cfg, split, ann_path, img_dir)

    def _to_float(self, x):
        return float(f"{x:.2f}")

    def convert_eval_format(self, all_bboxes):
        """(reference: coco.py:75-95)"""
        detections = []
        for image_id in all_bboxes:
            for item in all_bboxes[image_id]:
                cat_id = item["class"] - 1
                category_id = self._valid_ids[cat_id]
                bbox = list(map(float, item["bbox"]))
                bbox[2] -= bbox[0]
                bbox[3] -= bbox[1]
                detections.append({
                    "image_id": int(image_id),
                    "category_id": int(category_id),
                    "bbox": list(map(self._to_float, bbox[0:4])),
                    "score": float(f"{item['score']:.2f}"),
                })
        return detections

    def save_results(self, results, save_dir):
        with open(os.path.join(save_dir, "results_coco.json"), "w") as f:
            json.dump(self.convert_eval_format(results), f)

    def run_eval(self, results, save_dir):
        from centertrack_tpu.eval.coco_eval import evaluate_coco_bbox
        self.save_results(results, save_dir)
        return evaluate_coco_bbox(
            self.coco, os.path.join(save_dir, "results_coco.json"))


class COCOHP(COCODet):
    """COCO person-keypoints (reference: datasets/coco_hp.py)."""
    num_categories = 1
    class_name = ['']
    num_joints = 17
    default_resolution = [512, 512]
    max_objs = 32
    cat_ids = {1: 1}
    _valid_ids = [1]

    def __init__(self, cfg, split):
        data_dir = os.path.join(cfg_data_dir(cfg), "coco")
        img_dir = os.path.join(data_dir, f"{split}2017")
        ann_path = os.path.join(
            data_dir, "annotations", f"person_keypoints_{split}2017.json")
        GenericDataset.__init__(self, cfg, split, ann_path, img_dir)
        if split == "train":
            image_ids = self.coco.getImgIds()
            self.images = [i for i in image_ids
                           if len(self.coco.getAnnIds(imgIds=[i])) > 0]

    def run_eval(self, results, save_dir):
        from centertrack_tpu.eval.coco_eval import (evaluate_coco_bbox,
                                                    evaluate_coco_keypoints)
        self.save_results(results, save_dir)
        path = os.path.join(save_dir, "results_coco.json")
        kpt = evaluate_coco_keypoints(self.coco, path)
        box = evaluate_coco_bbox(self.coco, path)
        return {"keypoints": kpt, "bbox": box}

    def convert_eval_format(self, all_bboxes):
        """bbox + keypoints results (reference: coco_hp.py:62-92)."""
        detections = []
        for image_id in all_bboxes:
            for item in all_bboxes[image_id]:
                bbox = list(map(float, item["bbox"]))
                bbox[2] -= bbox[0]
                bbox[3] -= bbox[1]
                det = {
                    "image_id": int(image_id),
                    "category_id": 1,
                    "bbox": list(map(self._to_float, bbox)),
                    "score": float(f"{item['score']:.2f}"),
                }
                if "hps" in item:
                    pts = np.array(item["hps"], np.float32).reshape(-1, 2)
                    kps = np.concatenate(
                        [pts, np.ones((pts.shape[0], 1), np.float32)],
                        axis=1).reshape(-1).tolist()
                    det["keypoints"] = list(map(self._to_float, kps))
                detections.append(det)
        return detections


class MOT(GenericDataset):
    """MOT17/20 pedestrian tracking (reference: datasets/mot.py)."""
    num_categories = 1
    default_resolution = [544, 960]
    class_name = ['']
    max_objs = 256
    cat_ids = {1: 1, -1: -1}

    def __init__(self, cfg, split):
        self.dataset_version = cfg.dataset_version
        self.year = int(self.dataset_version[:2]) \
            if self.dataset_version else 17
        data_dir = os.path.join(cfg_data_dir(cfg), f"mot{self.year}")
        if cfg.dataset_version in ["17trainval", "17test"]:
            ann_file = "{}.json".format(
                "train" if split == "train" else "test")
        elif cfg.dataset_version == "17halftrain":
            ann_file = "train_half.json"
        else:  # 17halfval and default
            ann_file = "val_half.json" \
                if "halfval" in (cfg.dataset_version or "") \
                else f"{split}.json"
        img_dir = os.path.join(
            data_dir,
            "test" if "test" in (self.dataset_version or "") else "train")
        ann_path = os.path.join(data_dir, "annotations", ann_file)
        super().__init__(cfg, split, ann_path, img_dir)

    def save_results(self, results, save_dir):
        """MOTChallenge txt per video (reference: mot.py:52-83)."""
        results_dir = os.path.join(
            save_dir, f"results_mot{self.dataset_version}")
        os.makedirs(results_dir, exist_ok=True)
        for video in self.coco.dataset["videos"]:
            video_id = video["id"]
            file_name = video["file_name"]
            out_path = os.path.join(results_dir, f"{file_name}.txt")
            with open(out_path, "w") as f:
                images = self.video_to_images[video_id]
                tracks = defaultdict(list)
                for image_info in images:
                    if image_info["id"] not in results:
                        continue
                    result = results[image_info["id"]]
                    frame_id = image_info["frame_id"]
                    for item in result:
                        # don't mutate the caller's dicts: fall back to
                        # a local random id for untracked detections
                        tid = item.get("tracking_id")
                        if tid is None:
                            tid = np.random.randint(100000)
                        if item["active"] == 0:
                            continue
                        bbox = item["bbox"]
                        tracks[tid].append([frame_id] + list(bbox))
                rename_track_id = 0
                for track_id in sorted(tracks):
                    rename_track_id += 1
                    for t in tracks[track_id]:
                        f.write(
                            "{},{},{:.2f},{:.2f},{:.2f},{:.2f},-1,-1,-1,-1\n"
                            .format(t[0], rename_track_id, t[1], t[2],
                                    t[3] - t[1], t[4] - t[2]))
        return results_dir

    def run_eval(self, results, save_dir):
        from centertrack_tpu.eval.mot_eval import evaluate_mot_dir
        results_dir = self.save_results(results, save_dir)
        gt_type = ("_train_half" if "17halftrain" in
                   (self.dataset_version or "")
                   else "_val_half" if "17halfval" in
                   (self.dataset_version or "") else "")
        data_root = os.path.join(cfg_data_dir(self.cfg),
                                 f"mot{self.year}", "train")
        return evaluate_mot_dir(data_root, results_dir, gt_type=gt_type)


class KITTI(GenericDataset):
    """KITTI 2D/3D detection (reference: datasets/kitti.py)."""
    num_categories = 3
    default_resolution = [384, 1280]
    class_name = ['Pedestrian', 'Car', 'Cyclist']
    cat_ids = {1: 1, 2: 2, 3: 3, 4: -2, 5: -2, 6: -1, 7: -9999, 8: -9999,
               9: 0}
    max_objs = 50

    def __init__(self, cfg, split):
        data_dir = os.path.join(cfg_data_dir(cfg), "kitti")
        img_dir = os.path.join(data_dir, "images", "trainval")
        ann_path = os.path.join(
            data_dir, "annotations",
            f"kitti_v2_{cfg.kitti_split if hasattr(cfg, 'kitti_split') else '3dop'}_{split}.json")
        super().__init__(cfg, split, ann_path, img_dir)
        self.alpha_in_degree = False

    def save_results(self, results, save_dir):
        """KITTI txt per image (reference: kitti.py:56-89)."""
        results_dir = os.path.join(save_dir, "results_kitti")
        os.makedirs(results_dir, exist_ok=True)
        for img_id in results.keys():
            out_path = os.path.join(results_dir, f"{img_id:06d}.txt")
            with open(out_path, "w") as f:
                for item in results[img_id]:
                    class_name = self.class_name[item["class"] - 1]
                    alpha = item.get("alpha", -1)
                    rot_y = item.get("rot_y", -1)
                    dim = item.get("dim", [-1000, -1000, -1000])
                    if "dim" in item:
                        dim = [max(dim[0], 0.01), max(dim[1], 0.01),
                               max(dim[2], 0.01)]
                    loc = item.get("loc", [-1000, -1000, -1000])
                    f.write(f"{class_name} 0.0 0")
                    f.write(f" {alpha:.2f}")
                    f.write(" {:.2f} {:.2f} {:.2f} {:.2f}".format(
                        *item["bbox"]))
                    f.write(" {:.2f} {:.2f} {:.2f}".format(*dim))
                    f.write(" {:.2f} {:.2f} {:.2f}".format(*loc))
                    f.write(f" {rot_y:.2f} {item['score']:.2f}\n")
        return results_dir

    def run_eval(self, results, save_dir):
        from centertrack_tpu.eval.kitti_det_eval import evaluate_kitti_dir
        results_dir = self.save_results(results, save_dir)
        label_dir = os.path.join(cfg_data_dir(self.cfg), "kitti",
                                 "training", "label_val")
        return evaluate_kitti_dir(label_dir, results_dir,
                                  self.class_name)


class KITTITracking(KITTI):
    """KITTI multi-object tracking (reference: datasets/kitti_tracking.py)."""

    def __init__(self, cfg, split):
        data_dir = os.path.join(cfg_data_dir(cfg), "kitti_tracking")
        split_ = "train" if cfg.dataset_version != "test" else "test"
        img_dir = os.path.join(data_dir, "data_tracking_image_2",
                               f"{split_}ing", "image_02")
        ann_file_ = split_ if cfg.dataset_version == "" \
            else cfg.dataset_version
        ann_path = os.path.join(data_dir, "annotations",
                                f"tracking_{ann_file_}.json")
        GenericDataset.__init__(self, cfg, split, ann_path, img_dir)
        self.alpha_in_degree = False

    def save_results(self, results, save_dir):
        """Per-video KITTI tracking txt
        (reference: kitti_tracking.py:51-96)."""
        results_dir = os.path.join(save_dir, "results_kitti_tracking")
        os.makedirs(results_dir, exist_ok=True)
        for video in self.coco.dataset["videos"]:
            video_id = video["id"]
            file_name = video["file_name"]
            out_path = os.path.join(results_dir, f"{file_name}.txt")
            with open(out_path, "w") as f:
                images = self.video_to_images[video_id]
                for image_info in images:
                    img_id = image_info["id"]
                    if img_id not in results:
                        continue
                    frame_id = image_info["frame_id"]
                    for item in results[img_id]:
                        class_name = self.class_name[item["class"] - 1]
                        alpha = item.get("alpha", -1)
                        rot_y = item.get("rot_y", -10)
                        dim = item.get("dim", [-1, -1, -1])
                        if "dim" in item:
                            dim = [max(dim[0], 0.01), max(dim[1], 0.01),
                                   max(dim[2], 0.01)]
                        loc = item.get("loc", [-1000, -1000, -1000])
                        track_id = item.get("tracking_id", -1)
                        f.write(f"{frame_id - 1} {track_id} {class_name} "
                                f"-1 -1")
                        f.write(f" {int(alpha):d}")
                        f.write(" {:.2f} {:.2f} {:.2f} {:.2f}".format(
                            *item["bbox"]))
                        f.write(" {:d} {:d} {:d}".format(
                            int(dim[0]), int(dim[1]), int(dim[2])))
                        f.write(" {:d} {:d} {:d}".format(
                            int(loc[0]), int(loc[1]), int(loc[2])))
                        f.write(f" {int(rot_y):d} {item['score']:.2f}\n")
        return results_dir

    def run_eval(self, results, save_dir):
        from centertrack_tpu.eval.kitti_track_eval import (
            evaluate_kitti_tracking)
        results_dir = self.save_results(results, save_dir)
        return evaluate_kitti_tracking(results_dir,
                                       self.cfg.dataset_version)


class CrowdHuman(GenericDataset):
    """(reference: datasets/crowdhuman.py)"""
    num_categories = 1
    num_joints = 17
    default_resolution = [512, 512]
    max_objs = 128
    class_name = ['person']
    cat_ids = {1: 1}

    def __init__(self, cfg, split):
        data_dir = os.path.join(cfg_data_dir(cfg), "crowdhuman")
        img_dir = os.path.join(data_dir, f"CrowdHuman_{split}", "Images")
        ann_path = os.path.join(data_dir, "annotations", f"{split}.json")
        super().__init__(cfg, split, ann_path, img_dir)

    def save_results(self, results, save_dir):
        """odgt writer (reference: crowdhuman.py:47-73)."""
        out_path = os.path.join(save_dir, "results_crowdhuman.odgt")
        records = []
        for img_id in results:
            dtboxes = []
            for item in results[img_id]:
                bbox = item["bbox"]
                dtboxes.append({
                    "box": [float(bbox[0]), float(bbox[1]),
                            float(bbox[2] - bbox[0]),
                            float(bbox[3] - bbox[1])],
                    "score": float(item["score"]), "tag": 1})
            records.append({"ID": img_id, "dtboxes": dtboxes})
        with open(out_path, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        return out_path

    def run_eval(self, results, save_dir):
        self.save_results(results, save_dir)


class CustomDataset(GenericDataset):
    """User-specified paths/classes (reference: datasets/custom_dataset.py)."""
    num_categories = 1
    default_resolution = [-1, -1]
    class_name = ['']
    max_objs = 128
    cat_ids = {1: 1}

    def __init__(self, cfg, split):
        assert (cfg.custom_dataset_img_path and
                cfg.custom_dataset_ann_path and cfg.num_classes != -1 and
                cfg.input_h != -1 and cfg.input_w != -1), \
            "custom datasets require custom_dataset_img_path, " \
            "custom_dataset_ann_path, num_classes, input_h, input_w"
        self.num_categories = cfg.num_classes
        self.class_name = ['' for _ in range(self.num_categories)]
        self.default_resolution = [cfg.input_h, cfg.input_w]
        self.cat_ids = {i: i for i in range(1, self.num_categories + 1)}
        super().__init__(cfg, split, cfg.custom_dataset_ann_path,
                         cfg.custom_dataset_img_path)

    def run_eval(self, results, save_dir):
        pass


def cfg_data_dir(cfg) -> str:
    return os.environ.get("CENTERTRACK_DATA_DIR",
                          os.path.join(os.path.dirname(
                              os.path.dirname(os.path.dirname(
                                  os.path.abspath(__file__)))), "data"))


dataset_factory = {
    "custom": CustomDataset,
    "coco": COCODet,
    "coco_hp": COCOHP,
    "mot": MOT,
    "crowdhuman": CrowdHuman,
    "kitti": KITTI,
    "kitti_tracking": KITTITracking,
}


def get_dataset(name: str):
    """(reference: dataset_factory.py:20-33)"""
    if name == "nuscenes":
        from centertrack_tpu.data.nuscenes import NuScenes
        return NuScenes
    return dataset_factory[name]
