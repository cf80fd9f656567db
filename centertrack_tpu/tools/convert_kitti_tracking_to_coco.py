"""KITTI-tracking -> COCO-json converter with half splits
(reference: src/tools/convert_kittitrack_to_coco.py; same schema:
calib + alpha + dim/loc/rot_y + track ids, argparse paths).

Usage:
  python -m centertrack_tpu.tools.convert_kitti_tracking_to_coco \
      --data_path data/kitti_tracking
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

CATS = ['Pedestrian', 'Car', 'Cyclist', 'Van', 'Truck', 'Person_sitting',
        'Tram', 'Misc', 'DontCare']
CAT_IDS = {c: i + 1 for i, c in enumerate(CATS)}
CAT_IDS['Person'] = CAT_IDS['Person_sitting']


def read_calib(path: str) -> np.ndarray:
    """P2 matrix from a KITTI calib file (line index 2)."""
    with open(path) as f:
        for i, line in enumerate(f):
            if i == 2:
                return np.array(line.strip().split(" ")[1:],
                                np.float32).reshape(3, 4)
    raise ValueError(f"no P2 in {path}")


def convert(data_path: str, split: str, video_ids) -> dict:
    out = {"images": [], "annotations": [],
           "categories": [{"name": c, "id": i + 1}
                          for i, c in enumerate(CATS)],
           "videos": []}
    num_images_total = 0
    ann_cnt = 0
    phase = "train" if "test" not in split else "test"
    for vid in video_ids:
        video_name = f"{vid:04d}"
        out["videos"].append({"id": vid + 1, "file_name": video_name})
        video_path = os.path.join(
            data_path, "data_tracking_image_2", f"{phase}ing",
            "image_02", video_name)
        calib = read_calib(os.path.join(
            data_path, "data_tracking_calib", f"{phase}ing", "calib",
            f"{video_name}.txt"))
        image_files = sorted(os.listdir(video_path))
        num_images = len(image_files)
        if "half" in split:
            image_range = ([0, num_images // 2 - 1] if "train" in split
                           else [num_images // 2, num_images - 1])
        else:
            image_range = [0, num_images - 1]
        base = num_images_total
        for i, fn in enumerate(image_files):
            if not (image_range[0] <= i <= image_range[1]):
                continue
            out["images"].append({
                "file_name": f"{video_name}/{fn}",
                "id": base + i + 1,
                "frame_id": i + 1 - image_range[0],
                "video_id": vid + 1,
                "calib": calib.tolist(),
            })
        if phase == "train":
            label_path = os.path.join(data_path, "label_02",
                                      f"{video_name}.txt")
            if os.path.exists(label_path):
                with open(label_path) as f:
                    for line in f:
                        p = line.split()
                        frame = int(float(p[0]))
                        if not (image_range[0] <= frame <= image_range[1]):
                            continue
                        typ = p[2]
                        if typ not in CAT_IDS:
                            continue
                        ann_cnt += 1
                        x1, y1, x2, y2 = map(float, p[6:10])
                        out["annotations"].append({
                            "id": ann_cnt,
                            "image_id": base + frame + 1,
                            "category_id": CAT_IDS[typ],
                            "track_id": int(float(p[1])) + 1,
                            "bbox": [x1, y1, x2 - x1, y2 - y1],
                            "truncated": float(p[3]),
                            "occluded": int(float(p[4])),
                            "alpha": float(p[5]),
                            "dim": [float(p[10]), float(p[11]),
                                    float(p[12])],
                            "location": [float(p[13]), float(p[14]),
                                         float(p[15])],
                            "depth": float(p[15]),
                            "rotation_y": float(p[16]),
                        })
        num_images_total += num_images
    print(f"{split}: {len(out['images'])} images, "
          f"{len(out['annotations'])} annotations")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--splits", default="train_half,val_half,train,test")
    args = p.parse_args()
    out_dir = os.path.join(args.data_path, "annotations")
    os.makedirs(out_dir, exist_ok=True)
    for split in args.splits.split(","):
        vids = range(29) if "test" in split else range(21)
        out = convert(args.data_path, split, vids)
        with open(os.path.join(out_dir, f"tracking_{split}.json"),
                  "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
