"""Visualize MOT/KITTI tracking result txts over sequence frames
(reference: src/tools/vis_tracking_mot.py, vis_tracking_kitti.py).

Usage:
  python -m centertrack_tpu.tools.vis_tracking --fmt mot \
      --seq_dir data/mot17/train/MOT17-02-FRCNN/img1 \
      --results results_mot17halfval/MOT17-02-FRCNN.txt --out vis.mp4
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict

import cv2
import numpy as np


def load_results(path: str, fmt: str):
    per_frame = defaultdict(list)
    with open(path) as f:
        for line in f:
            if fmt == "mot":
                p = line.strip().split(",")
                frame, tid = int(p[0]), int(p[1])
                x, y, w, h = map(float, p[2:6])
                per_frame[frame].append((tid, (x, y, x + w, y + h)))
            else:  # kitti
                p = line.split()
                frame, tid = int(p[0]) + 1, int(p[1])
                x1, y1, x2, y2 = map(float, p[6:10])
                per_frame[frame].append((tid, (x1, y1, x2, y2)))
    return per_frame


def color_for(tid: int):
    rng = np.random.RandomState(tid * 7919 + 13)
    return tuple(int(c) for c in rng.randint(60, 255, 3))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seq_dir", required=True)
    p.add_argument("--results", required=True)
    p.add_argument("--fmt", default="mot", choices=["mot", "kitti"])
    p.add_argument("--out", default="vis_tracking.mp4")
    p.add_argument("--fps", type=int, default=20)
    args = p.parse_args()

    per_frame = load_results(args.results, args.fmt)
    frames = sorted(f for f in os.listdir(args.seq_dir)
                    if f.split(".")[-1].lower() in ("jpg", "png", "jpeg"))
    writer = None
    for i, fn in enumerate(frames):
        img = cv2.imread(os.path.join(args.seq_dir, fn))
        for tid, (x1, y1, x2, y2) in per_frame.get(i + 1, []):
            c = color_for(tid)
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)),
                          c, 2)
            cv2.putText(img, str(tid), (int(x1), max(int(y1) - 4, 0)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.6, c, 2)
        if writer is None:
            writer = cv2.VideoWriter(
                args.out, cv2.VideoWriter_fourcc(*"mp4v"), args.fps,
                (img.shape[1], img.shape[0]))
        writer.write(img)
    if writer:
        writer.release()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
