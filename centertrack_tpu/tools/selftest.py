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
                 seed=0, scale=1.0, max_objs=3, hard=False):
    """`scale` multiplies object size/velocity/margins so larger frame
    sizes keep the same object scale AT NETWORK INPUT RESOLUTION as the
    96x160 default (e.g. scale=2 on 1920x1080 frames warped to 544x960
    input reproduces the default's 16-30 px input-pixel objects —
    bench.py's honest-workload domain).

    `hard=True` switches to the DISCRIMINATIVE tracking domain the
    MOTA-parity harness uses (tests/parity_mota.py): 8-12 objects per
    video with crossing trajectories drawn in fixed z-order (nearer
    objects OCCLUDE — crossings force identity decisions), mid-sequence
    track births and deaths (objects enter/leave during the clip),
    and wide size/aspect/scale-drift variation. On this domain the
    torch reference lands well below MOTA 1.0 (~0.6-0.85), so a small
    |delta MOTA| between frameworks is meaningful evidence rather
    than a ceiling effect — the regime the reference is judged in
    (reference: readme/GETTING_STARTED.md:14-25, 66+ MOTA)."""
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations, videos = [], [], []
    img_id = ann_id = 0
    rng = np.random.RandomState(seed)
    for v in range(num_videos):
        videos.append({"id": v + 1, "file_name": f"video{v + 1}"})
        if hard:
            n_obj = rng.randint(8, 13)
            pos = rng.uniform([2 * scale, 2 * scale],
                              [width - 28 * scale, height - 20 * scale],
                              (n_obj, 2))
            # crossing paths: velocities biased to traverse the frame
            vel = rng.uniform(-3.0 * scale, 3.0 * scale, (n_obj, 2))
            size = rng.uniform([8 * scale, 7 * scale],
                               [30 * scale, 24 * scale], (n_obj, 2))
            # slow scale drift (approach/recede)
            growth = rng.uniform(-0.015, 0.02, n_obj)
            # births/deaths: ~half the tracks don't span the clip
            t_in = np.where(rng.rand(n_obj) < 0.4,
                            rng.randint(0, max(1, frames // 2), n_obj),
                            0)
            t_out = np.where(rng.rand(n_obj) < 0.4,
                             rng.randint(frames // 2, frames, n_obj),
                             frames)
            t_out = np.maximum(t_out, t_in + 4)
        else:
            n_obj = rng.randint(2, max_objs + 1)
            pos = rng.uniform([10 * scale, 10 * scale],
                              [width - 40 * scale, height - 30 * scale],
                              (n_obj, 2))
            vel = rng.uniform(-2.5 * scale, 2.5 * scale, (n_obj, 2))
            size = rng.uniform([16 * scale, 12 * scale],
                               [30 * scale, 22 * scale], (n_obj, 2))
            growth = np.zeros(n_obj)
            t_in = np.zeros(n_obj, int)
            t_out = np.full(n_obj, frames)
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
            # fixed z-order: later objects draw on top (occluders)
            for o in range(n_obj):
                if not (t_in[o] <= f < t_out[o]):
                    continue
                x, y = pos[o] + vel[o] * (f - t_in[o])
                g = 1.0 + growth[o] * (f - t_in[o])
                w, h = size[o] * g
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


def make_dataset_ddd(root, num_videos=6, frames=24, width=1600,
                     height=900, focal=1200.0, seed=0, max_objs=8):
    """Synthetic monocular-3D tracking dataset (nuScenes-camera
    geometry: 1600x900 frames, pinhole at the image center). Car-like
    cuboids drive on the ground plane; each frame renders their
    projected silhouettes painter's-order (far to near, so nearer
    objects OCCLUDE), with the +l/2 'front' face brightened as the
    orientation cue and a white dot at the projected 3D center.
    Annotations carry the full ddd target set the dataset layer
    consumes (data/generic.py:602-612): bbox, depth, dim, rotation_y,
    alpha, amodel_center (reference fields:
    src/lib/dataset/datasets/nuscenes.py:75-120)."""
    from centertrack_tpu.utils.ddd import (compute_box_3d,
                                           project_to_image,
                                           rot_y2alpha)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    calib = np.array([[focal, 0, width / 2, 0],
                      [0, focal, height / 2, 0],
                      [0, 0, 1, 0]], np.float32)
    images, annotations, videos = [], [], []
    img_id = ann_id = 0
    rng = np.random.RandomState(seed)
    for v in range(num_videos):
        videos.append({"id": v + 1, "file_name": f"video{v + 1}"})
        n_obj = rng.randint(4, max_objs + 1)
        # ground-plane states: x lateral [m], z forward [m], yaw
        x = rng.uniform(-14, 14, n_obj)
        z = rng.uniform(10, 45, n_obj)
        yaw = rng.uniform(-np.pi, np.pi, n_obj)
        vx = rng.uniform(-0.5, 0.5, n_obj)
        vz = rng.uniform(-0.8, 0.8, n_obj)
        dims = np.stack([rng.uniform(1.4, 1.8, n_obj),      # h
                         rng.uniform(1.6, 2.0, n_obj),      # w
                         rng.uniform(3.6, 4.8, n_obj)], 1)  # l
        colors = rng.randint(40, 200, (n_obj, 3))
        for f in range(frames):
            img_id += 1
            fn = f"v{v + 1}_f{f + 1}.jpg"
            img = rng.randint(180, 220, (height, width, 3), np.uint8)
            images.append({
                "id": img_id, "file_name": fn, "width": width,
                "height": height, "video_id": v + 1, "frame_id": f + 1,
                "calib": calib.tolist(),
            })
            xf = x + vx * f
            zf = np.clip(z + vz * f, 6.0, 60.0)
            order = np.argsort(-zf)  # painter's: far first
            for o in order:
                loc = np.array([xf[o], 1.5, zf[o]], np.float32)
                corners = compute_box_3d(dims[o], loc, yaw[o])
                pts = project_to_image(corners, calib)
                # full silhouette, then the front (+l/2) face cue
                hull = cv2.convexHull(pts.astype(np.int32))
                cv2.fillConvexPoly(
                    img, hull, tuple(int(c) for c in colors[o]))
                front = pts[[0, 1, 5, 4]].astype(np.int32)
                cv2.fillConvexPoly(img, cv2.convexHull(front), tuple(
                    int(min(255, c + 60)) for c in colors[o]))
                # 3D box center (location is the bottom-face center,
                # KITTI convention)
                center3d = np.array(
                    [loc[0], loc[1] - dims[o][0] / 2, loc[2]],
                    np.float32)
                amodel_ct = project_to_image(center3d[None], calib)[0]
                ix = int(round(amodel_ct[0]))
                iy = int(round(amodel_ct[1]))
                if 0 <= ix < width and 0 <= iy < height:
                    cv2.circle(img, (ix, iy), 4, (255, 255, 255), -1)
                x1, y1 = pts.min(axis=0)
                x2, y2 = pts.max(axis=0)
                bx1 = float(np.clip(x1, 0, width - 1))
                by1 = float(np.clip(y1, 0, height - 1))
                bx2 = float(np.clip(x2, 0, width - 1))
                by2 = float(np.clip(y2, 0, height - 1))
                if bx2 - bx1 < 6 or by2 - by1 < 6:
                    continue
                ann_id += 1
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": 1,
                    "bbox": [bx1, by1, bx2 - bx1, by2 - by1],
                    "area": float((bx2 - bx1) * (by2 - by1)),
                    "iscrowd": 0, "track_id": int(o) + 1,
                    "depth": float(zf[o]),
                    "dim": [float(d) for d in dims[o]],
                    "rotation_y": float(yaw[o]),
                    "alpha": float(rot_y2alpha(
                        yaw[o], amodel_ct[0], calib[0, 2], calib[0, 0])),
                    "amodel_center": [float(amodel_ct[0]),
                                      float(amodel_ct[1])],
                })
            cv2.imwrite(os.path.join(img_dir, fn), img)
    ann = {"images": images, "annotations": annotations,
           "videos": videos,
           "categories": [{"id": 1, "name": "car"}]}
    ann_path = os.path.join(root, "annotations_ddd.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return ann_path, img_dir


# 17 COCO joints as fixed fractional positions inside a person box
# (x-fraction, y-fraction): nose, eyes, ears, shoulders, elbows,
# wrists, hips, knees, ankles — a rigid "mannequin" layout so the
# keypoint heads have a deterministic geometric target.
POSE_LAYOUT = np.array([
    [0.50, 0.08], [0.42, 0.05], [0.58, 0.05], [0.35, 0.07],
    [0.65, 0.07], [0.30, 0.20], [0.70, 0.20], [0.20, 0.38],
    [0.80, 0.38], [0.15, 0.55], [0.85, 0.55], [0.35, 0.55],
    [0.65, 0.55], [0.35, 0.75], [0.65, 0.75], [0.35, 0.95],
    [0.65, 0.95]], np.float32)

# distinct per-joint draw colors (BGR), fixed so joint identity is
# learnable from appearance
POSE_COLORS = [(int(40 + 210 * ((j * 5) % 17) / 16),
                int(40 + 210 * ((j * 7) % 17) / 16),
                int(40 + 210 * ((j * 11) % 17) / 16))
               for j in range(17)]


def make_dataset_pose(root, num_videos=6, frames=24, width=1280,
                      height=720, seed=0, max_objs=5):
    """Synthetic pose-tracking dataset (COCO-person geometry): moving
    'mannequins' — tall filled rectangles with 17 per-joint colored
    dots at fixed fractional body positions (POSE_LAYOUT) — annotated
    with COCO keypoints [x, y, 2]*17 plus track ids. Trains the
    `tracking,multi_pose` head set (hps/hm_hp/hp_offset) end to end
    (reference pose dataset: src/lib/dataset/datasets/coco_hp.py)."""
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations, videos = [], [], []
    img_id = ann_id = 0
    rng = np.random.RandomState(seed)
    for v in range(num_videos):
        videos.append({"id": v + 1, "file_name": f"video{v + 1}"})
        n_obj = rng.randint(2, max_objs + 1)
        hgt = rng.uniform(110, 220, n_obj)          # person height px
        wdt = hgt * rng.uniform(0.38, 0.5, n_obj)
        px = np.array([rng.uniform(10, width - w - 10) for w in wdt])
        py = np.array([rng.uniform(10, height - h - 10) for h in hgt])
        pos = np.stack([px, py], axis=1)
        vel = rng.uniform(-5, 5, (n_obj, 2))
        colors = rng.randint(60, 200, (n_obj, 3))
        for f in range(frames):
            img_id += 1
            fn = f"v{v + 1}_f{f + 1}.jpg"
            img = rng.randint(180, 220, (height, width, 3), np.uint8)
            images.append({
                "id": img_id, "file_name": fn, "width": width,
                "height": height, "video_id": v + 1, "frame_id": f + 1,
            })
            for o in range(n_obj):
                x, y = pos[o] + vel[o] * f
                w, h = wdt[o], hgt[o]
                x = float(np.clip(x, 0, width - w))
                y = float(np.clip(y, 0, height - h))
                cv2.rectangle(img, (int(x), int(y)),
                              (int(x + w), int(y + h)),
                              tuple(int(c) for c in colors[o]), -1)
                kps = []
                for j in range(17):
                    jx = x + POSE_LAYOUT[j, 0] * w
                    jy = y + POSE_LAYOUT[j, 1] * h
                    cv2.circle(img, (int(jx), int(jy)), 4,
                               POSE_COLORS[j], -1)
                    kps += [float(jx), float(jy), 2]
                ann_id += 1
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": 1,
                    "bbox": [x, y, float(w), float(h)],
                    "area": float(w * h), "iscrowd": 0,
                    "track_id": o + 1, "keypoints": kps,
                    "num_keypoints": 17,
                })
            cv2.imwrite(os.path.join(img_dir, fn), img)
    ann = {"images": images, "annotations": annotations,
           "videos": videos,
           "categories": [{"id": 1, "name": "person"}]}
    ann_path = os.path.join(root, "annotations_pose.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return ann_path, img_dir


def build_cfg(ann_path: str, img_dir: str, dla_node: str = "dcn_local",
              compute_dtype: str = "float32", batch_size: int = 8,
              lr: float = 5e-4, epochs: int = 30, input_h: int = 96,
              input_w: int = 160, task: str = "tracking",
              num_classes: int = 1, lr_step=(60,), seed: int = 317):
    from centertrack_tpu.config import Config, parse_task, set_heads

    cfg = Config(
        task=task, dataset="custom", pre_hm=True,
        custom_dataset_ann_path=ann_path, custom_dataset_img_path=img_dir,
        num_classes=num_classes, input_h=input_h, input_w=input_w,
        dla_node=dla_node, compute_dtype=compute_dtype,
        batch_size=batch_size, lr=lr, lr_step=tuple(lr_step), seed=seed,
        hm_disturb=0.05, lost_disturb=0.4, fp_disturb=0.1,
        same_aug_pre=True, not_rand_crop=True, flip=0.0,
        track_thresh=0.3, new_thresh=0.3, max_age=3,
        num_epochs=epochs)
    cfg = parse_task(cfg)
    return set_heads(cfg, type("M", (), {
        "num_categories": 1, "default_resolution": (input_h, input_w),
        "num_joints": 17}))


def train(cfg, epochs: int, log=print, init=None, start_epoch=1):
    """Train the selftest model; returns (params, batch_stats).

    `init=(params, batch_stats)` resumes from existing weights (fresh
    optimizer state — used by the bench-ckpt fine-tune path), and
    `start_epoch` offsets the epoch counter so cfg.lr_step decay
    applies at the right absolute epoch (engine/trainer.py
    make_lr_schedule; reference: src/main.py:92-96)."""
    from centertrack_tpu.data.datasets import CustomDataset
    from centertrack_tpu.data.loader import DataLoader
    from centertrack_tpu.engine.trainer import Trainer
    from centertrack_tpu.models.model import create_model, init_model

    model = create_model(cfg.arch, cfg.heads_dict, cfg.head_convs_dict,
                         cfg)
    if init is not None:
        params, batch_stats = init
    else:
        params, batch_stats = init_model(model, cfg)
    trainer = Trainer(cfg, model, params, batch_stats)
    ds = CustomDataset(cfg, "train")
    loader = DataLoader(ds, cfg.batch_size, shuffle=True, num_workers=4,
                        seed=cfg.seed)
    for epoch in range(start_epoch, start_epoch + epochs):
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
