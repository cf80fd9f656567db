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


def _group_videos(cfg, dataset):
    """Split the dataset's image list into videos (boundary =
    frame_id 1, reference: test.py:90-100), then bucket videos by
    frame resolution — one batched device program handles one
    resolution (all frames of a MultiStreamDetector stack share the
    input warp shape)."""
    import cv2
    videos = []
    for ind in range(len(dataset)):
        img_id = dataset.images[ind]
        info = dataset.coco.loadImgs([img_id])[0]
        path = os.path.join(dataset.img_dir, info["file_name"])
        if info.get("frame_id", 1) == 1 or not videos:
            videos.append([])
        videos[-1].append((img_id, path, info))
    by_res = {}
    for vid in videos:
        info = vid[0][2]
        h, w = info.get("height"), info.get("width")
        if not h or not w:
            img = cv2.imread(vid[0][1])
            h, w = img.shape[:2]
        by_res.setdefault((int(h), int(w)), []).append(vid)
    return by_res


def test_multistream(cfg, args, n_streams):
    """Throughput eval: N videos tracked concurrently through ONE
    batched jitted program (engine/fused.MultiStreamDetector), results
    fetched with a pipeline lag. Device-tracker semantics (same as
    --fused demo); the TPU answer to the reference's DataLoader
    prefetch throughput mode (reference: src/test.py:53-130)."""
    import collections
    from concurrent.futures import ThreadPoolExecutor

    import cv2

    from centertrack_tpu.engine.fused import MultiStreamDetector

    assert cfg.tracking, "--multi_stream requires a tracking task"
    assert not args.load_results and not cfg.public_det, \
        "--multi_stream is incompatible with external detections"
    dataset_cls = get_dataset(cfg.test_dataset)
    split = "val" if not cfg.trainval else "test"
    dataset = dataset_cls(cfg, split)
    by_res = _group_videos(cfg, dataset)

    pool = ThreadPoolExecutor(2)
    results = {}
    t0 = time.time()
    n_frames = 0
    for (h, w), vids in sorted(by_res.items()):
        s = min(n_streams, len(vids))
        det = MultiStreamDetector(cfg, s, dataset_meta=dataset_cls)
        queue = collections.deque(vids)
        cur = [queue.popleft() for _ in range(s)]
        pos = [0] * s
        last = [None] * s  # last host frame per stream (tail padding)
        pend = collections.deque()
        lag = 4

        def read(path):
            return cv2.imread(path)

        def next_stack():
            """One frame per stream; returns (stack, ids) or None when
            every stream is drained. Streams that finish a video pull
            the next one (tracking reset); drained streams re-feed
            their last frame and their results are discarded."""
            ids = [None] * s
            frames = [None] * s
            alive = False
            for i in range(s):
                if cur[i] is not None and pos[i] >= len(cur[i]):
                    if queue:
                        cur[i] = queue.popleft()
                        pos[i] = 0
                        det.reset_stream(i)
                    else:
                        cur[i] = None
                if cur[i] is None:
                    frames[i] = last[i]
                    continue
                img_id, path, _ = cur[i][pos[i]]
                frames[i] = pool.submit(read, path)
                ids[i] = img_id
                pos[i] += 1
                alive = True
            if not alive:
                return None
            for i in range(s):
                if hasattr(frames[i], "result"):
                    frames[i] = frames[i].result()
                last[i] = frames[i]
            return np.stack(frames), ids

        def drain():
            lazy, ids = pend.popleft()
            per_stream = MultiStreamDetector.fetch_all(
                lazy, cfg.out_thresh)
            for i, img_id in enumerate(ids):
                if img_id is not None:
                    results[img_id] = per_stream[i]

        while True:
            nxt = next_stack()
            if nxt is None:
                break
            stack, ids = nxt
            pend.append((det.run(stack), ids))
            n_frames += sum(x is not None for x in ids)
            if len(pend) > lag:
                drain()
            if n_frames % 200 < s:
                dt = time.time() - t0
                print(f"{n_frames} frames | {n_frames / dt:.1f} fps "
                      f"aggregate ({s} streams @ {w}x{h})")
        while pend:
            drain()

    dt = time.time() - t0
    print(f"done: {n_frames} frames in {dt:.1f}s "
          f"({n_frames / max(dt, 1e-9):.1f} fps aggregate)")
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
    if getattr(args, "multi_stream", 0) > 0:
        test_multistream(cfg, args, args.multi_stream)
    else:
        test(cfg, args)


if __name__ == "__main__":
    main()
