"""Extreme-point box annotation tool (reference: src/tools/annot_bbox.py).

Click 4 extreme points (top/left/bottom/right-most) per object; the box
is their min/max envelope. Keys: ``d`` save + next image, ``a`` previous
image, ``ESC`` flush json and quit. Output: one txt per image (4 points
+ class per row) plus a COCO-style ``annotations.json`` with both the
bbox and the raw extreme points.

The annotation *logic* (point sorting, bbox derivation, txt/json
serialization) is importable and unit-testable; the cv2 window loop
only starts when a display is reachable, so the tool degrades cleanly
on headless machines instead of crashing at import.

Usage:
  python -m centertrack_tpu.tools.annot_bbox --image_path imgs/ \
      [--save_path out/] [--cats cat dog]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List

import numpy as np

IMAGE_EXT = ("jpg", "jpeg", "png", "webp")
MAX_CACHE = 20


def sort_extreme_points(pts: List[List[int]]) -> List[List[int]]:
    """Order 4 clicked points as [topmost, leftmost, bottommost,
    rightmost] (reference behavior of _sort_expt)."""
    arr = np.asarray(pts)
    return [pts[int(arr[:, 1].argmin())], pts[int(arr[:, 0].argmin())],
            pts[int(arr[:, 1].argmax())], pts[int(arr[:, 0].argmax())]]


def extreme_points_to_bbox(expt) -> List[int]:
    arr = np.asarray(expt, np.int32)
    return [int(arr[:, 0].min()), int(arr[:, 1].min()),
            int(arr[:, 0].max()), int(arr[:, 1].max())]


def save_txt(txt_name: str, pts_cls: List[List]) -> None:
    rows = [np.asarray(p[:4], np.int32).reshape(8).tolist() + [p[4]]
            for p in pts_cls]
    np.savetxt(txt_name, np.asarray(rows, np.int32).reshape(len(rows), 9),
               fmt="%d")


def add_image_annotations(anns: Dict, image_name: str,
                          expt_cls: List[List]) -> None:
    """Append one image's clicks to the COCO-style dict in place."""
    image_id = len(anns["images"]) + 1
    anns["images"].append({"file_name": image_name, "id": image_id})
    for item in expt_cls:
        anns["annotations"].append({
            "image_id": image_id,
            "id": len(anns["annotations"]) + 1,
            "category_id": item[4],
            "bbox": _xyxy_to_xywh(extreme_points_to_bbox(item[:4])),
            "extreme_points": [list(p) for p in item[:4]],
            "iscrowd": 0,
        })


def _xyxy_to_xywh(b):
    return [b[0], b[1], b[2] - b[0], b[3] - b[1]]


def list_images(image_path: str) -> List[str]:
    return [f for f in sorted(os.listdir(image_path))
            if f.rsplit(".", 1)[-1].lower() in IMAGE_EXT]


def load_or_init_annotations(ann_path: str, cats: List[str]) -> Dict:
    if os.path.exists(ann_path):
        with open(ann_path) as f:
            return json.load(f)
    return {"annotations": [], "images": [],
            "categories": [{"name": c, "id": i + 1}
                           for i, c in enumerate(cats)]}


def run_gui(args) -> None:
    import cv2

    os.makedirs(args.save_path, exist_ok=True)
    ann_path = os.path.join(args.save_path, "annotations.json")
    anns = load_or_init_annotations(ann_path, args.cats)
    done_names = {im["file_name"] for im in anns["images"]}
    image_names = list_images(args.image_path)

    state = {"pts": [], "expt_cls": [], "img": None}

    def click(event, x, y, flags, param):
        if event != cv2.EVENT_LBUTTONDOWN:
            return
        state["pts"].append([x, y])
        cv2.circle(state["img"], (x, y), 5, (255, 0, 255), -1)
        if len(state["pts"]) == 4:
            expt = sort_extreme_points(state["pts"])
            bbox = extreme_points_to_bbox(expt)
            state["expt_cls"].append(expt + [args.cls])
            cv2.rectangle(state["img"], (bbox[0], bbox[1]),
                          (bbox[2], bbox[3]), (255, 0, 255), 2,
                          cv2.LINE_AA)
            state["pts"] = []

    i, cached = 0, 0
    while i < len(image_names):
        name = image_names[i]
        txt_name = os.path.join(args.save_path,
                                name[:name.rfind(".")] + ".txt")
        if os.path.exists(txt_name) or name in done_names:
            i += 1
            continue
        state["img"] = cv2.imread(os.path.join(args.image_path, name))
        state["pts"], state["expt_cls"] = [], []
        cv2.namedWindow(name)
        cv2.setMouseCallback(name, click)
        while True:
            cv2.imshow(name, state["img"])
            key = cv2.waitKey(1)
            if key == ord("d"):
                save_txt(txt_name, state["expt_cls"])
                add_image_annotations(anns, name, state["expt_cls"])
                cached += len(state["expt_cls"])
                print("saved to", txt_name)
                if cached > MAX_CACHE:
                    with open(ann_path, "w") as f:
                        json.dump(anns, f)
                    cached = 0
                i += 1
                break
            if key == ord("a"):
                i = max(0, i - 1)
                break
            if key == 27:
                with open(ann_path, "w") as f:
                    json.dump(anns, f)
                return
        cv2.destroyAllWindows()
    with open(ann_path, "w") as f:
        json.dump(anns, f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_path", required=True)
    p.add_argument("--save_path", default="")
    p.add_argument("--cats", nargs="*", default=["cat"])
    p.add_argument("--cls", type=int, default=1)
    args = p.parse_args()
    if args.save_path == "":
        args.save_path = os.path.join(args.image_path, "..",
                                      "click_annotation")
    if not (os.environ.get("DISPLAY") or sys.platform == "darwin"):
        print("annot_bbox: no display available (DISPLAY unset). The "
              "annotation logic is importable for scripting; the "
              "interactive window needs a GUI session.")
        sys.exit(1)
    run_gui(args)


if __name__ == "__main__":
    main()
