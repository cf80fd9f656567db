"""Train and commit the bench checkpoints (assets/*.ckpt).

bench.py's honest workload needs TRAINED weights. This tool reproduces
the committed assets: it trains the selftest tracker (dla_34,
tools/selftest.py synthetic MOT domain) once with the exact `dcn` node
and once with `dcn_local1`, evaluates MOTA, and writes fp16-slimmed
checkpoints (reference training protocol being miniaturized:
src/main.py + experiments/mot17_half.sh).

Usage:
  python -m centertrack_tpu.tools.make_bench_ckpt \
      [--nodes dcn dcn_local1] [--epochs 30] [--out_dir assets]

The committed assets were produced with:
  selftest_local1_fp16.ckpt:
      --nodes dcn_local1 --epochs 30 --bench_domain   (544x960 input)
  selftest_dcn_fp16.ckpt:
      --nodes dcn --epochs 30 --bench_domain --input_h 384 --input_w 640
      (384x640: the largest dcn train shape the remote XLA compile
      helper accepts; scale=1920/input_w keeps object scale at input
      resolution identical to bench serving at 544x960 — measured
      transfer: 10+ live tracks/frame on the bench domain at 544x960)
"""

from __future__ import annotations

import argparse
import os
import pickle
import tempfile

import numpy as np


def slim_fp16(params, batch_stats, epoch, path):
    def cast(t):
        if isinstance(t, dict):
            return {k: cast(v) for k, v in t.items()}
        a = np.asarray(t)
        return a.astype(np.float16) if a.dtype == np.float32 else a

    payload = {"epoch": int(epoch), "params": cast(params),
               "batch_stats": cast(batch_stats)}
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", nargs="*",
                    default=["dcn", "dcn_local1"])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--out_dir", default="assets")
    ap.add_argument("--root", default="")
    ap.add_argument("--bench_domain", action="store_true",
                    help="train on 1920x1080 frames with objects scaled "
                         "to land at the 96x160 default's 16-30 px "
                         "scale AT NETWORK INPUT RESOLUTION — bench.py's "
                         "serving regime (object scale transfers across "
                         "any --input size; offsets/BN see full-size "
                         "maps)")
    ap.add_argument("--input_h", type=int, default=0,
                    help="bench_domain input height (default 544; the "
                         "96x160 mode ignores this)")
    ap.add_argument("--input_w", type=int, default=0)
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()

    from centertrack_tpu.tools import selftest

    os.makedirs(args.out_dir, exist_ok=True)
    root = args.root or tempfile.mkdtemp(prefix="ct_benchckpt_")
    if args.bench_domain:
        input_h = args.input_h or 544
        input_w = args.input_w or 960
        # object scale at input = 16-30 px iff scale = width / input_w
        ann_path, img_dir = selftest.make_dataset(
            root, width=1920, height=1080, scale=1920 / input_w,
            max_objs=8)
    else:
        ann_path, img_dir = selftest.make_dataset(root)
        input_h, input_w = 96, 160
    name = {"dcn": "selftest_dcn_fp16.ckpt",
            "dcn_local1": "selftest_local1_fp16.ckpt",
            "dcn_local": "selftest_local_fp16.ckpt",
            "dcn_mix": "selftest_mix_fp16.ckpt"}
    for node in args.nodes:
        cfg = selftest.build_cfg(ann_path, img_dir, dla_node=node,
                                 epochs=args.epochs,
                                 batch_size=args.batch_size,
                                 input_h=input_h, input_w=input_w)
        print(f"training {node} ({args.epochs} epochs)...", flush=True)
        params, bs = selftest.train(cfg, args.epochs)
        overall = selftest.evaluate(cfg, params, bs, ann_path, img_dir)
        print(f"{node}: MOTA {overall['mota']:.3f} "
              f"IDF1 {overall['idf1']:.3f}")
        slim_fp16(params, bs, args.epochs,
                  os.path.join(args.out_dir,
                               name.get(node, f"selftest_{node}.ckpt")))


if __name__ == "__main__":
    main()
