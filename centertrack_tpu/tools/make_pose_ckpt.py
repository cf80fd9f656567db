"""Train and commit the pose bench checkpoint
(assets/selftest_pose_fp16.ckpt).

bench.py's pose leg serves `tracking,multi_pose` through FusedDetector
at the reference's COCO pose operating point (512x512 input; the
reference publishes 33 ms multi_pose dla_1x — readme/MODEL_ZOO.md:72).
An honest throughput number needs TRAINED weights so the tracker
carries live tracks through the timed loop; this trains the flagship
dla_34 `tracking,multi_pose` model (hps + hm_hp + hp_offset heads)
from scratch on the synthetic mannequin scene
(tools/selftest.make_dataset_pose) and writes an fp16-slimmed pickle.

Usage:
  python -m centertrack_tpu.tools.make_pose_ckpt [--epochs 30]
      [--out assets/selftest_pose_fp16.ckpt]
"""

from __future__ import annotations

import argparse
import os
import tempfile

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--dla_node", default="dcn_local1")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--root", default="")
    ap.add_argument("--out", default="assets/selftest_pose_fp16.ckpt")
    ap.add_argument("--resume", default="",
                    help="fp16 ckpt to fine-tune from (fresh optimizer)")
    ap.add_argument("--start_epoch", type=int, default=1)
    ap.add_argument("--lr_step", default="60",
                    help="comma list of absolute epochs for x0.1 decay")
    args = ap.parse_args(argv)

    from centertrack_tpu.tools import selftest
    from centertrack_tpu.tools.make_bench_ckpt import slim_fp16

    root = args.root or tempfile.mkdtemp(prefix="ct_posesckpt_")
    ann_path, img_dir = selftest.make_dataset_pose(root)
    print(f"pose dataset at {root}")

    cfg = selftest.build_cfg(
        ann_path, img_dir, args.dla_node, "float32", args.batch_size,
        args.lr, args.epochs, input_h=512, input_w=512,
        task="tracking,multi_pose", num_classes=1,
        lr_step=tuple(int(e) for e in args.lr_step.split(",")))
    init = None
    if args.resume:
        import pickle
        import jax
        import jax.numpy as jnp
        with open(args.resume, "rb") as f:
            blob = pickle.load(f)
        f32 = lambda t: jnp.asarray(np.asarray(t), jnp.float32)
        init = (jax.tree.map(f32, blob["params"]),
                jax.tree.map(f32, blob["batch_stats"]))
        print(f"resuming from {args.resume} (epoch {blob.get('epoch')})")
    params, batch_stats = selftest.train(cfg, args.epochs, init=init,
                                         start_epoch=args.start_epoch)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    slim_fp16(params, batch_stats, args.epochs, args.out)

    # quick serving probe: live tracks + keypoint geometry sanity
    from centertrack_tpu.engine.fused import FusedDetector
    import dataclasses
    scfg = dataclasses.replace(cfg, compute_dtype="bfloat16",
                               track_thresh=0.3, new_thresh=0.3,
                               out_thresh=0.3, pre_thresh=0.3)
    det = FusedDetector(scfg, params=params, batch_stats=batch_stats,
                        dataset_meta=selftest.selftest_meta(cfg))
    import cv2
    import json as _json
    with open(ann_path) as f:
        db = _json.load(f)
    ims = sorted((im for im in db["images"] if im["video_id"] == 1),
                 key=lambda im: im["frame_id"])[:12]
    live, errs = [], []
    gt_by_img = {}
    for a in db["annotations"]:
        gt_by_img.setdefault(a["image_id"], []).append(a)
    for im in ims:
        frame = cv2.imread(os.path.join(img_dir, im["file_name"]))
        res = det.fetch_full(det.run(frame), scfg.out_thresh)
        live.append(len(res))
        gts = gt_by_img.get(im["id"], [])
        for r in res:
            if "hps" not in r or not gts:
                continue
            kp = np.asarray(r["hps"], np.float32).reshape(17, 2)
            best = min(
                np.abs(kp - np.asarray(g["keypoints"],
                                       np.float32).reshape(17, 3)[:, :2]
                       ).mean() for g in gts)
            errs.append(best)
    print(f"serving probe: {np.mean(live):.1f} live tracks/frame, "
          f"mean joint err {np.mean(errs or [-1]):.1f} px")


if __name__ == "__main__":
    main()
