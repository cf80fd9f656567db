"""Train and commit the nuScenes-3D bench checkpoint
(assets/selftest_ddd_fp16.ckpt).

bench.py's nuscenes3d leg serves `tracking,ddd` through FusedDetector
at the reference's nuScenes operating point (448x800 input on 1600x900
camera frames, 10-class hm head — reference: README.md:47-51 publishes
28 FPS there). An honest throughput number needs TRAINED weights so
the tracker carries live tracks through the timed loop; this tool
trains the flagship dla_34 `tracking,ddd` model from scratch on the
synthetic pinhole-camera scene (tools/selftest.make_dataset_ddd) and
writes an fp16-slimmed pickle like make_bench_ckpt does for the 2D
legs.

Usage:
  python -m centertrack_tpu.tools.make_ddd_ckpt [--epochs 30]
      [--out assets/selftest_ddd_fp16.ckpt]
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
    ap.add_argument("--num_classes", type=int, default=10,
                    help="hm head channels (10 = nuScenes head shape; "
                         "the synthetic scene uses category 1 only)")
    ap.add_argument("--root", default="")
    ap.add_argument("--out", default="assets/selftest_ddd_fp16.ckpt")
    ap.add_argument("--resume", default="",
                    help="fp16 ckpt to fine-tune from (fresh optimizer)")
    ap.add_argument("--start_epoch", type=int, default=1)
    ap.add_argument("--lr_step", default="60",
                    help="comma list of absolute epochs for x0.1 decay")
    args = ap.parse_args(argv)

    from centertrack_tpu.tools import selftest
    from centertrack_tpu.tools.make_bench_ckpt import slim_fp16

    root = args.root or tempfile.mkdtemp(prefix="ct_dddckpt_")
    ann_path, img_dir = selftest.make_dataset_ddd(root)
    print(f"ddd dataset at {root}")

    cfg = selftest.build_cfg(
        ann_path, img_dir, args.dla_node, "float32", args.batch_size,
        args.lr, args.epochs, input_h=448, input_w=800,
        task="tracking,ddd", num_classes=args.num_classes,
        lr_step=tuple(int(e) for e in args.lr_step.split(",")))
    init = None
    if args.resume:
        import pickle
        import jax.numpy as jnp
        with open(args.resume, "rb") as f:
            blob = pickle.load(f)
        import jax
        f32 = lambda t: jnp.asarray(np.asarray(t), jnp.float32)
        init = (jax.tree.map(f32, blob["params"]),
                jax.tree.map(f32, blob["batch_stats"]))
        print(f"resuming from {args.resume} (epoch {blob.get('epoch')})")
    params, batch_stats = selftest.train(cfg, args.epochs, init=init,
                                         start_epoch=args.start_epoch)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    slim_fp16(params, batch_stats, args.epochs, args.out)

    # quick serving probe: live tracks + depth sanity on a fresh clip.
    # track_thresh 0.1 matches both the bench nuscenes3d leg and the
    # reference's published nuScenes 3D-tracking operating point
    # (reference: experiments/nuScenes_3Dtracking.sh:5).
    from centertrack_tpu.engine.fused import FusedDetector
    import dataclasses
    scfg = dataclasses.replace(cfg, compute_dtype="bfloat16",
                               track_thresh=0.1, new_thresh=0.1,
                               out_thresh=0.1, pre_thresh=0.1)
    det = FusedDetector(scfg, params=params, batch_stats=batch_stats,
                        dataset_meta=selftest.selftest_meta(cfg))
    import cv2
    import json as _json
    with open(ann_path) as f:
        db = _json.load(f)
    ims = sorted((im for im in db["images"] if im["video_id"] == 1),
                 key=lambda im: im["frame_id"])[:12]
    live, deps = [], []
    for im in ims:
        frame = cv2.imread(os.path.join(img_dir, im["file_name"]))
        res = det.fetch_full(det.run(frame), scfg.out_thresh)
        live.append(len(res))
        deps += [r["dep"] for r in res]
    print(f"serving probe: {np.mean(live):.1f} live tracks/frame, "
          f"depth range [{min(deps or [0]):.1f}, "
          f"{max(deps or [0]):.1f}] m")


if __name__ == "__main__":
    main()
