"""Benchmark evaluation entry point (reference: src/test.py).

Runs a whole dataset split through the Detector sequentially per video
(resetting tracking at video boundaries), writes results and calls the
dataset's evaluator.

Usage:
  python -m centertrack_tpu.cli.test tracking --dataset mot \
      --dataset_version 17halfval --pre_hm --load_model model.ckpt
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from centertrack_tpu.cli.opts import build_parser, args_to_config
from centertrack_tpu.config import finalize
from centertrack_tpu.data.datasets import get_dataset
from centertrack_tpu.engine.detector import Detector


def load_external_results(path, dataset):
    """Public-detection / preloaded results json
    (reference: test.py:65-72, 101-107)."""
    with open(path) as f:
        raw = json.load(f)
    return {int(k): v for k, v in raw.items()}


def test(cfg, args):
    dataset_cls = get_dataset(cfg.test_dataset)
    split = "val" if not cfg.trainval else "test"
    dataset = dataset_cls(cfg, split)
    detector = Detector(cfg, dataset_meta=dataset_cls)

    load_results = {}
    if args.load_results:
        load_results = load_external_results(args.load_results, dataset)
        print(f"loaded results for {len(load_results)} images")

    results = {}
    num_iters = len(dataset) if cfg.num_iters < 0 else cfg.num_iters
    avg_time = {}

    # Image read-ahead (the reference overlaps pre-processing with the
    # GPU via a DataLoader worker, test.py:53-76; here decode+warp run
    # on device, so prefetching the JPEG reads is what's left to hide).
    from concurrent.futures import ThreadPoolExecutor
    import cv2
    pool = ThreadPoolExecutor(2)

    def read(ind):
        info = dataset.coco.loadImgs([dataset.images[ind]])[0]
        return cv2.imread(
            os.path.join(dataset.img_dir, info["file_name"]))

    pending = {0: pool.submit(read, 0)} if num_iters > 0 else {}

    for ind in range(num_iters):
        img_id = dataset.images[ind]
        img_info = dataset.coco.loadImgs([img_id])[0]
        img_path = os.path.join(dataset.img_dir, img_info["file_name"])

        meta = {}
        if "calib" in img_info:
            meta["calib"] = img_info["calib"]
        # video boundary: reset tracking, inject seed dets
        # (reference: test.py:90-107)
        if cfg.tracking and img_info.get("frame_id", 1) == 1:
            detector.reset_tracking()
            if img_id in load_results:
                meta["pre_dets"] = load_results[img_id]
        if cfg.public_det and img_id in load_results:
            meta["cur_dets"] = load_results[img_id]

        image = pending.pop(ind).result() if ind in pending else None
        if ind + 1 < num_iters:
            pending[ind + 1] = pool.submit(read, ind + 1)
        ret = detector.run(image if image is not None else img_path,
                           meta)
        results[img_id] = ret["results"]
        for k in ("tot", "pre", "net", "post", "track"):
            avg_time[k] = avg_time.get(k, 0.0) + ret[k]
        if ind % 50 == 0:
            msg = f"{ind}/{num_iters} |" + "".join(
                f" {k} {v / (ind + 1):.3f}s" for k, v in avg_time.items())
            print(msg)

    save_dir = os.path.join("exp", cfg.task.replace(",", "_"), cfg.exp_id)
    os.makedirs(save_dir, exist_ok=True)
    if args.save_results:
        path = os.path.join(
            save_dir, f"save_results_{cfg.test_dataset}"
                      f"{cfg.dataset_version}.json")
        with open(path, "w") as f:
            json.dump({k: [_jsonable(d) for d in v]
                       for k, v in results.items()}, f)
        print("results saved to", path)
    return dataset.run_eval(results, save_dir)


def _jsonable(d):
    return {k: (v.tolist() if isinstance(v, np.ndarray) else
                float(v) if isinstance(v, (np.floating,)) else
                int(v) if isinstance(v, (np.integer,)) else v)
            for k, v in d.items()}


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    cfg = args_to_config(args)
    dataset_cls = get_dataset(cfg.dataset)
    cfg = finalize(cfg, dataset_cls)
    test(cfg, args)


if __name__ == "__main__":
    main()
