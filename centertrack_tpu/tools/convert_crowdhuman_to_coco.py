"""CrowdHuman odgt -> COCO-json (reference:
src/tools/convert_crowdhuman_to_coco.py; fbox boxes, iscrowd from the
'ignore' extra tag).

Usage:
  python -m centertrack_tpu.tools.convert_crowdhuman_to_coco \
      --data_path data/crowdhuman
"""

from __future__ import annotations

import argparse
import json
import os


def convert(data_path: str, split: str) -> dict:
    odgt = os.path.join(data_path, f"annotation_{split}.odgt")
    out = {"images": [], "annotations": [],
           "categories": [{"id": 1, "name": "person"}]}
    image_cnt = ann_cnt = 0
    with open(odgt) as f:
        for line in f:
            rec = json.loads(line)
            image_cnt += 1
            out["images"].append({
                "id": image_cnt,
                "file_name": rec["ID"] + ".jpg",
            })
            for gt in rec.get("gtboxes", []):
                ann_cnt += 1
                iscrowd = int(gt.get("extra", {}).get("ignore", 0) == 1
                              or gt.get("tag") != "person")
                out["annotations"].append({
                    "id": ann_cnt,
                    "image_id": image_cnt,
                    "category_id": 1,
                    "bbox": [float(v) for v in gt["fbox"]],
                    "iscrowd": iscrowd,
                })
    print(f"{split}: {image_cnt} images, {ann_cnt} annotations")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--splits", default="train,val")
    args = p.parse_args()
    out_dir = os.path.join(args.data_path, "annotations")
    os.makedirs(out_dir, exist_ok=True)
    for split in args.splits.split(","):
        with open(os.path.join(out_dir, f"{split}.json"), "w") as f:
            json.dump(convert(args.data_path, split), f)


if __name__ == "__main__":
    main()
