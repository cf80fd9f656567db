"""End-to-end self-test: train -> track -> CLEAR-MOT evaluate, no
external data.

Generates a synthetic tracking dataset (moving colored boxes), trains
the flagship DLA-34 tracking model from scratch, runs the detector over
held-out sequences, and scores MOTA with the hermetic evaluator
(eval/mot_metrics.py). Validates the entire learning + inference +
association + metric stack in one command.

Usage:
  python -m centertrack_tpu.tools.selftest [--epochs 30] [--dla_node conv]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile

import cv2
import numpy as np


def make_dataset(root, num_videos=6, frames=24, width=160, height=96,
                 seed=0, scale=1.0, max_objs=3):
    """`scale` multiplies object size/velocity/margins so larger frame
    sizes keep the same object scale AT NETWORK INPUT RESOLUTION as the
    96x160 default (e.g. scale=2 on 1920x1080 frames warped to 544x960
    input reproduces the default's 16-30 px input-pixel objects —
    bench.py's honest-workload domain)."""
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations, videos = [], [], []
    img_id = ann_id = 0
    rng = np.random.RandomState(seed)
    for v in range(num_videos):
        videos.append({"id": v + 1, "file_name": f"video{v + 1}"})
        n_obj = rng.randint(2, max_objs + 1)
        pos = rng.uniform([10 * scale, 10 * scale],
                          [width - 40 * scale, height - 30 * scale],
                          (n_obj, 2))
        vel = rng.uniform(-2.5 * scale, 2.5 * scale, (n_obj, 2))
        size = rng.uniform([16 * scale, 12 * scale],
                           [30 * scale, 22 * scale], (n_obj, 2))
        colors = rng.randint(40, 220, (n_obj, 3))
        for f in range(frames):
            img_id += 1
            fn = f"v{v + 1}_f{f + 1}.jpg"
            img = rng.randint(180, 220, (height, width, 3),
                              np.uint8)
            images.append({
                "id": img_id, "file_name": fn, "width": width,
                "height": height, "video_id": v + 1, "frame_id": f + 1,
            })
            for o in range(n_obj):
                x, y = pos[o] + vel[o] * f
                w, h = size[o]
                x = float(np.clip(x, 0, width - w))
                y = float(np.clip(y, 0, height - h))
                cv2.rectangle(img, (int(x), int(y)),
                              (int(x + w), int(y + h)),
                              tuple(int(c) for c in colors[o]), -1)
                cv2.circle(img, (int(x + w / 2), int(y + h / 2)),
                           max(2, int(round(3 * scale))),
                           (255, 255, 255), -1)
                ann_id += 1
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": 1,
                    "bbox": [x, y, float(w), float(h)],
                    "area": float(w * h), "iscrowd": 0,
                    "track_id": o + 1,
                })
            cv2.imwrite(os.path.join(img_dir, fn), img)
    ann = {"images": images, "annotations": annotations,
           "videos": videos,
           "categories": [{"id": 1, "name": "box"}]}
    ann_path = os.path.join(root, "annotations.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return ann_path, img_dir


def build_cfg(ann_path: str, img_dir: str, dla_node: str = "dcn_local",
              compute_dtype: str = "float32", batch_size: int = 8,
              lr: float = 5e-4, epochs: int = 30, input_h: int = 96,
              input_w: int = 160):
    from centertrack_tpu.config import Config, parse_task, set_heads

    cfg = Config(
        task="tracking", dataset="custom", pre_hm=True,
        custom_dataset_ann_path=ann_path, custom_dataset_img_path=img_dir,
        num_classes=1, input_h=input_h, input_w=input_w,
        dla_node=dla_node, compute_dtype=compute_dtype,
        batch_size=batch_size, lr=lr,
        hm_disturb=0.05, lost_disturb=0.4, fp_disturb=0.1,
        same_aug_pre=True, not_rand_crop=True, flip=0.0,
        track_thresh=0.3, new_thresh=0.3, max_age=3,
        num_epochs=epochs)
    cfg = parse_task(cfg)
    return set_heads(cfg, type("M", (), {
        "num_categories": 1, "default_resolution": (input_h, input_w),
        "num_joints": 17}))


def train(cfg, epochs: int, log=print):
    """Train the selftest model; returns (params, batch_stats)."""
    from centertrack_tpu.data.datasets import CustomDataset
    from centertrack_tpu.data.loader import DataLoader
    from centertrack_tpu.engine.trainer import Trainer
    from centertrack_tpu.models.model import create_model, init_model

    model = create_model(cfg.arch, cfg.heads_dict, cfg.head_convs_dict,
                         cfg)
    params, batch_stats = init_model(model, cfg)
    trainer = Trainer(cfg, model, params, batch_stats)
    ds = CustomDataset(cfg, "train")
    loader = DataLoader(ds, cfg.batch_size, shuffle=True, num_workers=4)
    for epoch in range(1, epochs + 1):
        stats = trainer.train(epoch, loader, log_every=1000)
        if epoch % 5 == 0 or epoch == 1:
            log(f"epoch {epoch}: tot {stats['tot']:.4f} "
                f"hm {stats.get('hm', 0):.4f}")
    return trainer.state.params, trainer.state.batch_stats


def selftest_meta(cfg):
    from centertrack_tpu.data.datasets import CustomDataset

    ds = CustomDataset(cfg, "train")

    class Meta:
        num_categories = 1
        default_resolution = (cfg.input_h, cfg.input_w)
        num_joints = 17
        rest_focal_length = 1200
        flip_idx = []
        mean = ds.mean.reshape(3)
        std = ds.std.reshape(3)

    return Meta


def evaluate(cfg, params, batch_stats, ann_path: str, img_dir: str,
             log=print):
    """Track every video with a fresh Detector and CLEAR-MOT score it.
    Returns the overall metrics dict."""
    from centertrack_tpu.engine.detector import Detector
    from centertrack_tpu.eval.mot_metrics import (MOTAccumulator,
                                                  combine_metrics)

    det = Detector(cfg, params=params, batch_stats=batch_stats,
                   dataset_meta=selftest_meta(cfg))
    with open(ann_path) as f:
        db = json.load(f)
    by_video = {}
    for im in db["images"]:
        by_video.setdefault(im["video_id"], []).append(im)
    gt_by_image = {}
    for a in db["annotations"]:
        gt_by_image.setdefault(a["image_id"], []).append(a)

    accs, summaries = {}, {}
    for vid, ims in sorted(by_video.items()):
        det.reset_tracking()
        acc = MOTAccumulator()
        for im in sorted(ims, key=lambda x: x["frame_id"]):
            frame = cv2.imread(os.path.join(img_dir, im["file_name"]))
            ret = det.run(frame)
            hyp_ids, hyp_boxes = [], []
            for r in ret["results"]:
                if r.get("active", 1) == 0:
                    continue
                b = r["bbox"]
                hyp_ids.append(r["tracking_id"])
                hyp_boxes.append([b[0], b[1], b[2] - b[0], b[3] - b[1]])
            gts = gt_by_image.get(im["id"], [])
            acc.update([g["track_id"] for g in gts],
                       np.array([g["bbox"] for g in gts]).reshape(-1, 4),
                       hyp_ids, np.array(hyp_boxes).reshape(-1, 4))
        accs[f"video{vid}"] = acc
        summaries[f"video{vid}"] = acc.metrics()
        m = summaries[f"video{vid}"]
        log(f"video{vid}: MOTA {m['mota']:.3f} IDF1 {m['idf1']:.3f} "
            f"FP {m['num_false_positives']} FN {m['num_misses']} "
            f"IDSW {m['num_switches']}")
    overall = combine_metrics(summaries, accs)
    log(f"OVERALL: MOTA {overall['mota']:.3f} "
        f"IDF1 {overall['idf1']:.3f}")
    return overall


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--dla_node", default="dcn_local")
    p.add_argument("--compute_dtype", default="float32")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--root", default="")
    p.add_argument("--save_ckpt", default="",
                   help="save the trained checkpoint here")
    p.add_argument("--mota_floor", type=float, default=-10.0,
                   help="exit nonzero if OVERALL MOTA below this")
    args = p.parse_args(argv)

    root = args.root or tempfile.mkdtemp(prefix="ct_selftest_")
    ann_path, img_dir = make_dataset(root)
    print(f"dataset at {root}")

    cfg = build_cfg(ann_path, img_dir, args.dla_node,
                    args.compute_dtype, args.batch_size, args.lr,
                    args.epochs)
    params, batch_stats = train(cfg, args.epochs)
    if args.save_ckpt:
        from centertrack_tpu.models.model import save_model
        save_model(args.save_ckpt, args.epochs, params, batch_stats)
        print(f"saved {args.save_ckpt}")
    overall = evaluate(cfg, params, batch_stats, ann_path, img_dir)
    if overall["mota"] < args.mota_floor:
        raise SystemExit(1)
    return overall


if __name__ == "__main__":
    main()
