"""MOT17/MOT16 -> COCO-json converter with half-video splits
(reference: src/tools/convert_mot_to_coco.py; identical output schema,
argparse-driven instead of hardcoded paths).

Usage:
  python -m centertrack_tpu.tools.convert_mot_to_coco --data_path data/mot17
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

NON_PERSON_CLASSES = {3, 4, 5, 6, 9, 10, 11}
IGNORED_PERSON_CLASSES = {2, 7, 8, 12}


def convert_split(data_path: str, split: str, half_video: bool = True,
                  write_split_gt: bool = True,
                  write_split_det: bool = True,
                  mot15: bool = False) -> dict:
    src = os.path.join(data_path,
                       "train" if half_video or split != "test" else "test")
    out = {"images": [], "annotations": [],
           "categories": [{"id": 1, "name": "pedestrian"}],
           "videos": []}
    image_cnt = ann_cnt = video_cnt = 0
    for seq in sorted(os.listdir(src)):
        if seq.startswith("."):
            continue
        if "mot17" in data_path.lower() and split != "test" \
                and "FRCNN" not in seq:
            continue
        video_cnt += 1
        out["videos"].append({"id": video_cnt, "file_name": seq})
        seq_path = os.path.join(src, seq)
        img_dir = os.path.join(seq_path, "img1")
        num_images = len(
            [f for f in os.listdir(img_dir) if f.endswith(".jpg")])
        if half_video and "half" in split:
            image_range = ([0, num_images // 2] if "train" in split
                           else [num_images // 2 + 1, num_images - 1])
        else:
            image_range = [0, num_images - 1]
        for i in range(num_images):
            if i < image_range[0] or i > image_range[1]:
                continue
            out["images"].append({
                "file_name": f"{seq}/img1/{i + 1:06d}.jpg",
                "id": image_cnt + i + 1,
                "frame_id": i + 1 - image_range[0],
                "prev_image_id": image_cnt + i if i > 0 else -1,
                "next_image_id":
                    image_cnt + i + 2 if i < num_images - 1 else -1,
                "video_id": video_cnt,
            })
        if split != "test":
            anns = np.loadtxt(os.path.join(seq_path, "gt", "gt.txt"),
                              dtype=np.float32, delimiter=",", ndmin=2)
            if write_split_gt and "half" in split:
                sel = [r for r in anns
                       if image_range[0] <= int(r[0]) - 1 <= image_range[1]]
                with open(os.path.join(
                        seq_path, "gt", f"gt_{split}.txt"), "w") as f:
                    for o in sel:
                        f.write("{:d},{:d},{:d},{:d},{:d},{:d},{:d},{:d},"
                                "{:.6f}\n".format(
                                    int(o[0]) - image_range[0], int(o[1]),
                                    int(o[2]), int(o[3]), int(o[4]),
                                    int(o[5]), int(o[6]), int(o[7]), o[8]))
            det_path = os.path.join(seq_path, "det", "det.txt")
            if write_split_det and "half" in split and \
                    os.path.exists(det_path):
                dets = np.loadtxt(det_path, dtype=np.float32,
                                  delimiter=",", ndmin=2)
                sel = [r for r in dets
                       if image_range[0] <= int(r[0]) - 1 <= image_range[1]]
                with open(os.path.join(
                        seq_path, "det", f"det_{split}.txt"), "w") as f:
                    for o in sel:
                        f.write("{:d},{:d},{:.1f},{:.1f},{:.1f},{:.1f},"
                                "{:.6f}\n".format(
                                    int(o[0]) - image_range[0], int(o[1]),
                                    *[float(v) for v in o[2:7]]))
            for row in anns:
                frame_id = int(row[0])
                if not (image_range[0] <= frame_id - 1 <= image_range[1]):
                    continue
                ann_cnt += 1
                if not mot15:
                    if float(row[8]) < 0.25 or int(row[6]) != 1:
                        continue
                    if int(row[7]) in NON_PERSON_CLASSES:
                        continue
                    category_id = (-1 if int(row[7])
                                   in IGNORED_PERSON_CLASSES else 1)
                else:
                    category_id = 1
                out["annotations"].append({
                    "id": ann_cnt,
                    "category_id": category_id,
                    "image_id": image_cnt + frame_id,
                    "track_id": int(row[1]),
                    "bbox": [float(v) for v in row[2:6]],
                    "conf": float(row[6]),
                })
        image_cnt += num_images
    print(f"{split}: {len(out['images'])} images, "
          f"{len(out['annotations'])} annotations")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--splits", default="train_half,val_half,train,test")
    p.add_argument("--mot15", action="store_true")
    args = p.parse_args()
    out_dir = os.path.join(args.data_path, "annotations")
    os.makedirs(out_dir, exist_ok=True)
    for split in args.splits.split(","):
        out = convert_split(args.data_path, split, mot15=args.mot15)
        with open(os.path.join(out_dir, f"{split}.json"), "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
