"""Quantify exact-DCN vs clamped-local DCN output drift.

`dcn` (exact bilinear gather) and `dcn_local`/`dcn_local1` (offsets
clamped to +/-R px, gather-free) share an identical parameter tree, so
the SAME params can be applied under both node types and the head maps
compared directly (reference op being approximated: DCNv2 CUDA kernel,
consumed at src/lib/model/networks/dla.py:506-518).

Freshly initialized models predict zero offsets (conv_offset_mask is
zero-init, as in the reference), making the two paths trivially equal.
To probe realistic regimes this script injects Gaussian noise into
every conv_offset_mask kernel at a sweep of scales, reports the
resulting offset magnitudes, and measures per-head drift on real video
frames (or random frames when no video is available).

Usage:
  python -m centertrack_tpu.tools.dcn_drift \
      [--video /path/clip.mp4] [--frames 2] [--h 272] [--w 480]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def load_frames(video, n, h, w):
    import cv2
    frames = []
    if video:
        cap = cv2.VideoCapture(video)
        while len(frames) < n:
            ok, img = cap.read()
            if not ok:
                break
            frames.append(cv2.resize(img, (w, h)).astype(np.float32)
                          / 255.0)
        cap.release()
    if not frames:
        rng = np.random.RandomState(0)
        frames = [rng.rand(h, w, 3).astype(np.float32) for _ in range(n)]
    mean = np.array([0.40789654, 0.44719302, 0.47026115], np.float32)
    std = np.array([0.28863828, 0.27408164, 0.27809835], np.float32)
    return [(f - mean) / std for f in frames]


def trained_mode(args):
    """Validate the clamp against TRAINED offsets (not noise): train the
    selftest model with the exact `dcn` node, then evaluate the SAME
    parameters under dcn / dcn_local (+/-2 px) / dcn_local1 (+/-1 px)
    and report MOTA deltas plus the per-module trained offset-magnitude
    distribution (reference behavior being approximated: trained DCNv2
    offsets, src/lib/model/networks/dla.py:513)."""
    import dataclasses
    import tempfile

    import jax
    import jax.numpy as jnp

    from centertrack_tpu.tools import selftest

    root = args.root or tempfile.mkdtemp(prefix="ct_dcndrift_")
    ann_path, img_dir = selftest.make_dataset(root)
    cfg = selftest.build_cfg(ann_path, img_dir, dla_node="dcn",
                             epochs=args.epochs)
    if args.load_ckpt:
        import pickle
        with open(args.load_ckpt, "rb") as f:
            ckpt = pickle.load(f)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), ckpt["params"])
        bs = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), ckpt["batch_stats"])
        print(f"loaded {args.load_ckpt} (skipping training)")
    else:
        print(f"training exact-dcn selftest model "
              f"({args.epochs} epochs)...", flush=True)
        params, bs = selftest.train(cfg, args.epochs)
    if args.save_ckpt:
        from centertrack_tpu.models.model import save_model
        save_model(args.save_ckpt, args.epochs, params, bs)
        print(f"saved {args.save_ckpt}")

    # ---- trained offset magnitudes per DCN module --------------------
    from centertrack_tpu.models.model import create_model

    model = create_model(cfg.arch, cfg.heads_dict, cfg.head_convs_dict,
                         cfg)
    frames = load_frames(args.video, 2, cfg.input_h, cfg.input_w)
    x = jnp.asarray(np.stack(frames))
    hm0 = jnp.zeros((x.shape[0], cfg.input_h, cfg.input_w, 1))
    _, inter = model.apply(
        {"params": params, "batch_stats": bs}, x, x, hm0, train=False,
        capture_intermediates=lambda mdl, _:
            mdl.name == "conv_offset_mask")
    stats = {}
    flat = jax.tree_util.tree_flatten_with_path(inter)[0]
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        if not hasattr(leaf, "ndim") or leaf.ndim != 4:
            continue
        k2 = leaf.shape[-1] // 3
        off = np.abs(np.asarray(leaf[..., :2 * k2], np.float32))
        mod = key.replace("['intermediates']", "").replace(
            "['__call__']", "").replace("[0]", "").strip("[]'").replace(
            "']['", "/")
        stats[mod] = {
            "p50": round(float(np.percentile(off, 50)), 3),
            "p95": round(float(np.percentile(off, 95)), 3),
            "p99": round(float(np.percentile(off, 99)), 3),
            "max": round(float(off.max()), 3),
            "frac_gt_1px": round(float((off > 1.0).mean()), 4),
            "frac_gt_2px": round(float((off > 2.0).mean()), 4),
        }
    print("\ntrained |offset| per DCN module (output-grid px):")
    for mod, s in stats.items():
        print(f"  {mod}: p50 {s['p50']} p95 {s['p95']} p99 {s['p99']} "
              f"max {s['max']} >1px {s['frac_gt_1px']:.1%} "
              f">2px {s['frac_gt_2px']:.1%}")

    # ---- cross-node MOTA ---------------------------------------------
    results = {}
    nodes = args.nodes or ["dcn", "dcn_mix", "dcn_local", "dcn_local1"]
    for node in nodes:
        cfg_n = dataclasses.replace(cfg, dla_node=node)
        print(f"\nevaluating node={node}...", flush=True)
        overall = selftest.evaluate(cfg_n, params, bs, ann_path, img_dir)
        results[node] = {"mota": round(overall["mota"], 4),
                         "idf1": round(overall["idf1"], 4)}
    report = {"offset_stats": stats, "eval": results}
    if "dcn" in results:
        for n, r in results.items():
            if n != "dcn":
                report[f"mota_delta_{n.replace('dcn_', '')}"] = round(
                    r["mota"] - results["dcn"]["mota"], 4)
    print("\n" + json.dumps(report["eval"], indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", default="/root/reference/videos/"
                                       "nuscenes_mini.mp4")
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--h", type=int, default=272)
    ap.add_argument("--w", type=int, default=480)
    ap.add_argument("--scales", type=float, nargs="*",
                    default=[0.01, 0.03, 0.1])
    ap.add_argument("--local", default="dcn_local1",
                    choices=["dcn_local", "dcn_local1"])
    ap.add_argument("--trained", action="store_true",
                    help="train exact-dcn on the selftest set, then "
                         "cross-evaluate under the clamped nodes")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--root", default="")
    ap.add_argument("--save_ckpt", default="")
    ap.add_argument("--load_ckpt", default="",
                    help="skip training; load params from this ckpt "
                         "(e.g. assets/selftest_dcn_fp16.ckpt)")
    ap.add_argument("--nodes", nargs="*", default=None,
                    help="node types to cross-evaluate "
                         "(default: dcn dcn_mix dcn_local dcn_local1)")
    ap.add_argument("--out", default="",
                    help="write the trained-mode JSON report here")
    args = ap.parse_args()
    if args.trained:
        return trained_mode(args)

    import jax
    import jax.numpy as jnp
    from centertrack_tpu.config import Config, parse_task, set_heads
    from centertrack_tpu.models.model import create_model, init_model

    class Meta:
        num_categories = 1
        default_resolution = (args.h, args.w)
        num_joints = 17

    def build(node):
        cfg = Config(task="tracking", pre_hm=True, dla_node=node,
                     input_h=args.h, input_w=args.w)
        cfg = parse_task(cfg)
        cfg = set_heads(cfg, Meta)
        model = create_model(cfg.arch, cfg.heads_dict,
                             cfg.head_convs_dict, cfg)
        return cfg, model

    cfg_e, model_e = build("dcn")
    _, model_l = build(args.local)
    params, bs = init_model(model_e, cfg_e)

    frames = load_frames(args.video, args.frames, args.h, args.w)
    x = jnp.asarray(np.stack(frames))
    hm0 = jnp.zeros((x.shape[0], args.h, args.w, 1))

    rng = np.random.RandomState(0)

    def noisify(tree, scale):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = {}
        for path, leaf in flat:
            key = jax.tree_util.keystr(path)
            if "conv_offset_mask" in key and "kernel" in key:
                leaf = leaf + scale * rng.randn(*leaf.shape).astype(
                    np.float32)
            out[key] = leaf
        # rebuild
        treedef = jax.tree_util.tree_structure(tree)
        leaves = [out[jax.tree_util.keystr(p)]
                  for p, _ in jax.tree_util.tree_flatten_with_path(
                      tree)[0]]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    @jax.jit
    def fwd_e(p, x, hm):
        return model_e.apply({"params": p, "batch_stats": bs}, x, x, hm,
                             train=False)[-1]

    @jax.jit
    def fwd_l(p, x, hm):
        return model_l.apply({"params": p, "batch_stats": bs}, x, x, hm,
                             train=False)[-1]

    report = []
    for scale in args.scales:
        p = noisify(params, scale)
        oe = fwd_e(p, x, hm0)
        ol = fwd_l(p, x, hm0)
        row = {"offset_conv_noise": scale}
        # measure actual offset magnitude at the first neck DCN
        hm_e = jax.nn.sigmoid(oe["hm"])
        hm_l = jax.nn.sigmoid(ol["hm"])
        row["hm_max_abs_diff"] = float(jnp.abs(hm_e - hm_l).max())
        row["hm_mean_abs_diff"] = float(jnp.abs(hm_e - hm_l).mean())
        for head in ("wh", "tracking", "reg"):
            if head in oe:
                d = jnp.abs(oe[head] - ol[head])
                row[f"{head}_max_abs_diff"] = float(d.max())
        report.append(row)
        print(json.dumps(row))
    return report


if __name__ == "__main__":
    main()
