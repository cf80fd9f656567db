"""Synthetic tiny-COCO fixture: 2 videos of moving squares with track ids."""

import json
import os

import cv2
import numpy as np


def make_tiny_tracking_dataset(root, num_videos=2, frames_per_video=4,
                               width=96, height=64):
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations, videos = [], [], []
    img_id, ann_id = 0, 0
    rng = np.random.RandomState(0)
    for v in range(num_videos):
        videos.append({"id": v + 1, "file_name": f"video{v + 1}"})
        # two objects per video moving diagonally
        starts = rng.randint(5, 25, size=(2, 2))
        for f in range(frames_per_video):
            img_id += 1
            fn = f"v{v + 1}_f{f + 1}.jpg"
            img = np.full((height, width, 3), 200, np.uint8)
            images.append({
                "id": img_id, "file_name": fn, "width": width,
                "height": height, "video_id": v + 1, "frame_id": f + 1,
            })
            for o in range(2):
                x = int(starts[o, 0] + 3 * f)
                y = int(starts[o, 1] + 2 * f)
                w, h = 20, 16
                color = (40 + 100 * o, 60, 180 - 80 * o)
                cv2.rectangle(img, (x, y), (x + w, y + h), color, -1)
                ann_id += 1
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": 1,
                    "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                    "track_id": o + 1,
                })
            cv2.imwrite(os.path.join(img_dir, fn), img)
    ann = {
        "images": images, "annotations": annotations, "videos": videos,
        "categories": [{"id": 1, "name": "thing"}],
    }
    ann_path = os.path.join(root, "annotations.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return ann_path, img_dir
