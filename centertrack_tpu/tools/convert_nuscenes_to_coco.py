"""nuScenes -> COCO-json converter, devkit-free
(reference: src/tools/convert_nuScenes.py, which drives nuscenes-devkit;
this implementation reads the raw v1.0 DB tables directly so it runs
without the devkit).

Emits the same schema the data layer consumes: per-camera images with
calib / trans_matrix / pose+cs records / sample_token / sensor_id /
frame_id, and annotations with camera-frame 3D boxes (dim/location/
rotation_y/alpha/amodel_center/velocity/attributes/track_id) plus the
projected-and-clipped 2D bbox, with the same occlusion-based visibility
filter and (video, sensor, frame) image reordering.

Usage:
  python -m centertrack_tpu.tools.convert_nuscenes_to_coco \
      --data_path data/nuscenes --version v1.0-mini [--splits mini]
      [--scene_splits splits.json]   # {"train": [...], "val": [...]}
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

import numpy as np

from centertrack_tpu.data.nuscenes import Quat

CATS = ['car', 'truck', 'bus', 'trailer', 'construction_vehicle',
        'pedestrian', 'motorcycle', 'bicycle', 'traffic_cone', 'barrier']
CAT_IDS = {v: i + 1 for i, v in enumerate(CATS)}
SENSOR_ID = {'RADAR_FRONT': 7, 'RADAR_FRONT_LEFT': 9,
             'RADAR_FRONT_RIGHT': 10, 'RADAR_BACK_LEFT': 11,
             'RADAR_BACK_RIGHT': 12, 'LIDAR_TOP': 8,
             'CAM_FRONT': 1, 'CAM_FRONT_RIGHT': 2,
             'CAM_BACK_RIGHT': 3, 'CAM_BACK': 4, 'CAM_BACK_LEFT': 5,
             'CAM_FRONT_LEFT': 6}
USED_SENSOR = ['CAM_FRONT', 'CAM_FRONT_RIGHT', 'CAM_BACK_RIGHT',
               'CAM_BACK', 'CAM_BACK_LEFT', 'CAM_FRONT_LEFT']
ATTRIBUTE_TO_ID = {
    '': 0, 'cycle.with_rider': 1, 'cycle.without_rider': 2,
    'pedestrian.moving': 3, 'pedestrian.standing': 4,
    'pedestrian.sitting_lying_down': 5,
    'vehicle.moving': 6, 'vehicle.parked': 7, 'vehicle.stopped': 8}

# raw category -> detection name (nuscenes devkit mapping)
DETECTION_NAME = {
    'vehicle.car': 'car', 'vehicle.truck': 'truck', 'vehicle.bus.bendy':
    'bus', 'vehicle.bus.rigid': 'bus', 'vehicle.trailer': 'trailer',
    'vehicle.construction': 'construction_vehicle',
    'human.pedestrian.adult': 'pedestrian',
    'human.pedestrian.child': 'pedestrian',
    'human.pedestrian.construction_worker': 'pedestrian',
    'human.pedestrian.police_officer': 'pedestrian',
    'vehicle.motorcycle': 'motorcycle', 'vehicle.bicycle': 'bicycle',
    'movable_object.trafficcone': 'traffic_cone',
    'movable_object.barrier': 'barrier'}


def _tmatrix(translation, rotation_wxyz):
    """4x4 homogeneous transform."""
    m = np.eye(4)
    q = Quat(rotation_wxyz)
    w, x, y, z = q.q
    m[:3, :3] = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    m[:3, 3] = translation
    return m


class Tables:
    def __init__(self, root, version):
        self.root = root
        d = os.path.join(root, version)
        for name in ("sample", "sample_data", "calibrated_sensor",
                     "ego_pose", "sample_annotation", "instance",
                     "category", "attribute", "scene", "sensor"):
            with open(os.path.join(d, f"{name}.json")) as f:
                rows = json.load(f)
            setattr(self, name, {r["token"]: r for r in rows})
        self.ann_by_sample = defaultdict(list)
        for a in self.sample_annotation.values():
            self.ann_by_sample[a["sample_token"]].append(a)

    def velocity(self, ann):
        """Global-frame velocity from neighbor annotations
        (devkit nusc.box_velocity)."""
        prev_t = ann["prev"]
        next_t = ann["next"]
        first = self.sample_annotation.get(prev_t, ann)
        last = self.sample_annotation.get(next_t, ann)
        if first is ann and last is ann:
            return np.zeros(3)
        p0 = np.array(first["translation"])
        p1 = np.array(last["translation"])
        t0 = self.sample[first["sample_token"]]["timestamp"] / 1e6
        t1 = self.sample[last["sample_token"]]["timestamp"] / 1e6
        if t1 - t0 <= 0:
            return np.zeros(3)
        return (p1 - p0) / (t1 - t0)


def _bbox_inside(b1, b2):
    return (b1[0] > b2[0] and b1[0] + b1[2] < b2[0] + b2[2] and
            b1[1] > b2[1] and b1[1] + b1[3] < b2[1] + b2[3])


def convert(root, version, split, scene_names=None):
    t = Tables(root, version)
    out = {"images": [], "annotations": [],
           "categories": [{"name": c, "id": i + 1}
                          for i, c in enumerate(CATS)],
           "videos": [], "attributes": ATTRIBUTE_TO_ID}
    num_images = num_anns = num_videos = 0

    # order samples per scene by timestamp chain
    samples = sorted(t.sample.values(), key=lambda s: s["timestamp"])
    track_ids = {}
    frame_ids = {}
    for sample in samples:
        scene = t.scene[sample["scene_token"]]
        if scene_names is not None and scene["name"] not in scene_names:
            continue
        if sample["prev"] == "":
            num_videos += 1
            out["videos"].append(
                {"id": num_videos, "file_name": scene["name"]})
            frame_ids = {k: 0 for k in sample["data"]}
            track_ids = {}
        for sensor_name, image_token in sample["data"].items():
            if sensor_name not in USED_SENSOR:
                continue
            sd = t.sample_data[image_token]
            cs = t.calibrated_sensor[sd["calibrated_sensor_token"]]
            pose = t.ego_pose[sd["ego_pose_token"]]
            num_images += 1
            global_from_car = _tmatrix(pose["translation"],
                                       pose["rotation"])
            car_from_sensor = _tmatrix(cs["translation"], cs["rotation"])
            trans_matrix = global_from_car @ car_from_sensor
            intrinsic = np.array(cs["camera_intrinsic"])
            calib = np.eye(4, dtype=np.float32)[:3]
            calib[:3, :3] = intrinsic
            frame_ids[sensor_name] += 1
            width, height = sd["width"], sd["height"]
            out["images"].append({
                "id": num_images,
                "file_name": sd["filename"],
                "calib": calib.tolist(),
                "video_id": num_videos,
                "frame_id": frame_ids[sensor_name],
                "sensor_id": SENSOR_ID[sensor_name],
                "sample_token": sample["token"],
                "trans_matrix": trans_matrix.tolist(),
                "width": width, "height": height,
                "pose_record_trans": pose["translation"],
                "pose_record_rot": pose["rotation"],
                "cs_record_trans": cs["translation"],
                "cs_record_rot": cs["rotation"],
            })

            # world -> camera transforms for boxes
            inv_pose_r = Quat(pose["rotation"])
            inv_pose_r.q[1:] *= -1
            inv_cs_r = Quat(cs["rotation"])
            inv_cs_r.q[1:] *= -1

            anns = []
            for sa in t.ann_by_sample[sample["token"]]:
                cat_name = t.instance[
                    sa["instance_token"]]["category_token"]
                raw_name = t.category[cat_name]["name"]
                det_name = DETECTION_NAME.get(raw_name)
                if det_name is None:
                    continue
                # box: global -> ego -> sensor frame
                center = np.array(sa["translation"], np.float64)
                rot = Quat(sa["rotation"])
                center = inv_pose_r.rotate(
                    center - np.array(pose["translation"]))
                rot = inv_pose_r * rot
                center = inv_cs_r.rotate(
                    center - np.array(cs["translation"]))
                rot = inv_cs_r * rot
                w, l, h = sa["size"]

                # visibility: any corner in front and inside image
                corners = _corners(center, (w, l, h), rot)
                in_front = corners[2] > 0.1
                pts = intrinsic @ corners
                pts2 = pts[:2] / np.maximum(pts[2], 1e-6)
                vis = ((pts2[0] >= 0) & (pts2[0] < width) &
                       (pts2[1] >= 0) & (pts2[1] < height) & in_front)
                if not vis.any():
                    continue
                num_anns += 1
                v = rot.rotate(np.array([1.0, 0, 0]))
                yaw = -np.arctan2(v[2], v[0])
                bottom_center = center + np.array([0, h / 2, 0])
                amodel = intrinsic @ center
                amodel_center = (amodel[:2] / max(amodel[2], 1e-6)
                                 ).tolist()
                if sa["instance_token"] not in track_ids:
                    track_ids[sa["instance_token"]] = len(track_ids) + 1
                atts = [t.attribute[at]["name"]
                        for at in sa["attribute_tokens"]]
                att = atts[0] if atts else ""
                vel_g = t.velocity(sa)
                vel = (np.linalg.inv(trans_matrix) @
                       np.array([vel_g[0], vel_g[1], vel_g[2], 0.0])
                       ).tolist()
                # 2D bbox from visible projected corners, clipped
                ok = in_front
                xs = pts2[0][ok]
                ys = pts2[1][ok]
                x1 = float(np.clip(xs.min(), 0, width - 1))
                y1 = float(np.clip(ys.min(), 0, height - 1))
                x2 = float(np.clip(xs.max(), 0, width - 1))
                y2 = float(np.clip(ys.max(), 0, height - 1))
                alpha = yaw - np.arctan2(
                    (x1 + x2) / 2 - intrinsic[0, 2], intrinsic[0, 0])
                if alpha > np.pi:
                    alpha -= 2 * np.pi
                if alpha < -np.pi:
                    alpha += 2 * np.pi
                anns.append({
                    "id": num_anns,
                    "image_id": num_images,
                    "category_id": CAT_IDS[det_name],
                    "dim": [float(h), float(w), float(l)],
                    "location": [float(bottom_center[0]),
                                 float(bottom_center[1]),
                                 float(bottom_center[2])],
                    "depth": float(bottom_center[2]),
                    "occluded": 0, "truncated": 0,
                    "rotation_y": float(yaw),
                    "amodel_center": amodel_center,
                    "iscrowd": 0,
                    "track_id": track_ids[sa["instance_token"]],
                    "attributes": ATTRIBUTE_TO_ID.get(att, 0),
                    "velocity": vel,
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": (x2 - x1) * (y2 - y1),
                    "alpha": float(alpha),
                })
            # occlusion filter (reference: convert_nuScenes.py:195-207)
            visible = []
            for i in range(len(anns)):
                occluded = False
                for j in range(len(anns)):
                    if (anns[i]["depth"] - min(anns[i]["dim"]) / 2 >
                            anns[j]["depth"] + max(anns[j]["dim"]) / 2
                            and _bbox_inside(anns[i]["bbox"],
                                             anns[j]["bbox"])):
                        occluded = True
                        break
                if not occluded:
                    visible.append(anns[i])
            out["annotations"].extend(visible)

    # reorder images by (video, sensor) sequence so frame_id-1 lookups
    # find the same sensor (reference: convert_nuScenes.py:238-253)
    out["images"].sort(key=lambda im: (
        im["video_id"] * 20 + im["sensor_id"], im["frame_id"]))
    print(f"{split}: {len(out['images'])} images, "
          f"{len(out['annotations'])} annotations, "
          f"{num_videos} scenes")
    return out


def _corners(center, wlh, rot: Quat) -> np.ndarray:
    w, l, h = wlh
    x = l / 2 * np.array([1, 1, 1, 1, -1, -1, -1, -1])
    y = w / 2 * np.array([1, -1, -1, 1, 1, -1, -1, 1])
    z = h / 2 * np.array([1, 1, -1, -1, 1, 1, -1, -1])
    pts = np.stack([x, y, z])
    r = np.stack([rot.rotate(pts[:, i]) for i in range(8)], axis=1)
    return r + np.asarray(center).reshape(3, 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--splits", default="train,val")
    p.add_argument("--scene_splits", default="",
                   help="json file {'train': [scene names], 'val': [...]};"
                        " omit to include every scene (v1.0-mini)")
    args = p.parse_args()
    scene_splits = None
    if args.scene_splits:
        with open(args.scene_splits) as f:
            scene_splits = json.load(f)
    out_dir = os.path.join(args.data_path, "annotations")
    os.makedirs(out_dir, exist_ok=True)
    for split in args.splits.split(","):
        names = scene_splits.get(split) if scene_splits else None
        out = convert(args.data_path, args.version, split, names)
        with open(os.path.join(out_dir, f"{split}.json"), "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
