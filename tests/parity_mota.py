"""Cross-framework END-METRIC parity: train the torch reference AND the
TPU framework on the same synthetic MOT domain with the same schedule,
evaluate both with the same hermetic CLEAR-MOT, and compare MOTA.

This closes the strongest remaining evidence gap: behavioral per-frame
parity (tests/test_full_pipeline_parity.py) shows the *pipelines* agree
given the same weights; this harness shows the *frameworks* — data
pipeline, losses, optimizer, schedule, inference, association — reach
the same end metric when each trains its own weights from scratch.

Reference side: the REAL reference modules (src/lib/trainer.py:123-181,
src/main.py:28-97, src/lib/detector.py:55-172) run in torch on CPU,
with only environment stubs (tests/ref_pipeline.install_stubs) and the
pure-torch DCN stand-in (tests/torch_ref.DCN). Our side: the selftest
train/eval path (centertrack_tpu/tools/selftest.py).

Usage (writes docs/parity_mota.json):
  python -m tests.parity_mota --nodes conv,dcn --epochs 30

Test-support code only; nothing here ships in the framework.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------- domain

def make_domain(root, num_videos=6, frames=24, seed=0, hard=True):
    """The DISCRIMINATIVE selftest MOT domain: 8-12 objects per video,
    crossing trajectories with z-order occlusion, mid-sequence track
    births/deaths, and scale/aspect drift — the reference lands at
    ~0.6-0.85 MOTA here instead of saturating at 0.99, so |delta MOTA|
    between frameworks measures real association behavior
    (selftest.make_dataset(hard=True); VERDICT r4 item 5)."""
    from centertrack_tpu.tools.selftest import make_dataset

    return make_dataset(root, num_videos=num_videos, frames=frames,
                        seed=seed, hard=hard)


def _common_ref_args(ann_path, img_dir, node):
    return [
        "tracking", "--dataset", "custom",
        "--custom_dataset_ann_path", ann_path,
        "--custom_dataset_img_path", img_dir,
        "--num_classes", "1", "--input_h", "96", "--input_w", "160",
        "--gpus", "-1", "--pre_hm", "--dla_node", node,
        "--track_thresh", "0.3", "--new_thresh", "0.3", "--max_age", "3",
    ]


# ------------------------------------------------------- reference train

def train_reference(ann_path, img_dir, node, epochs, ckpt_out,
                    batch_size=8, lr=5e-4, log=print, seed=317):
    """Train the reference with its own Trainer/GenericDataset on CPU
    (reference: src/main.py:28-97, src/lib/trainer.py:123-181)."""
    import torch

    from tests.ref_pipeline import build_reference_opt, install_stubs

    install_stubs()
    torch.manual_seed(seed)  # reference: src/main.py:29, opts.py:48-49
    torch.set_num_threads(1)

    args = _common_ref_args(ann_path, img_dir, node) + [
        "--batch_size", str(batch_size), "--lr", str(lr),
        "--num_epochs", str(epochs),
        # the selftest schedule (tools/selftest.py:81-90)
        "--hm_disturb", "0.05", "--lost_disturb", "0.4",
        "--fp_disturb", "0.1", "--same_aug_pre", "--not_rand_crop",
        "--flip", "0.0", "--num_workers", "0",
    ]
    opt = build_reference_opt(args)
    opt.device = torch.device("cpu")

    import importlib

    from tests.torch_ref import DCN

    dla = importlib.import_module("model.networks.dla")
    dla.DCN = DCN
    dla.DLA.load_pretrained_model = lambda self, **k: None  # no egress

    from dataset.dataset_factory import get_dataset
    from model.model import create_model, save_model
    from trainer import Trainer

    # Latent reference bug (SURVEY.md §2.1): with --not_rand_crop and a
    # python-float scale, _get_aug_param does `s = [s, s]` then
    # `s * np.clip(...)` -> TypeError (generic_dataset.py:274-277).
    # Feed it np.float64 so its own math runs unmodified (the
    # `type(s) == float` list branch is never taken upstream either —
    # s is np.float64 whenever the path works).
    import dataset.generic_dataset as gd

    if not getattr(gd.GenericDataset._get_aug_param, "_s_patched", False):
        orig_aug = gd.GenericDataset._get_aug_param

        def _aug(self, c, s, width, height, disturb=False):
            if isinstance(s, float):
                s = np.float64(s)
            return orig_aug(self, c, s, width, height, disturb=disturb)

        _aug._s_patched = True
        gd.GenericDataset._get_aug_param = _aug

    Dataset = get_dataset(opt.dataset)
    model = create_model(opt.arch, opt.heads, opt.head_conv, opt=opt)
    optimizer = torch.optim.Adam(model.parameters(), opt.lr)
    trainer = Trainer(opt, model, optimizer)
    trainer.set_device(opt.gpus, opt.chunk_sizes, opt.device)

    loader = torch.utils.data.DataLoader(
        Dataset(opt, "train"), batch_size=opt.batch_size, shuffle=True,
        num_workers=0, drop_last=True)
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        stats, _ = trainer.train(epoch, loader)
        if epoch % 5 == 0 or epoch == 1:
            log(f"[ref/{node}] epoch {epoch}: "
                + " ".join(f"{k} {v:.4f}" for k, v in stats.items()
                           if k != "time")
                + f" ({time.time() - t0:.0f}s)")
    save_model(ckpt_out, epochs, model)
    return ckpt_out


# -------------------------------------------------------- reference eval

def eval_reference(ckpt, ann_path, img_dir, node, log=print):
    """Track every video with the reference Detector; score with OUR
    hermetic CLEAR-MOT (same accumulator as tools/selftest.evaluate)."""
    import cv2

    from centertrack_tpu.eval.mot_metrics import (MOTAccumulator,
                                                  combine_metrics)
    from tests.ref_pipeline import (build_reference_detector,
                                    build_reference_opt, install_stubs)

    install_stubs()
    args = _common_ref_args(ann_path, img_dir, node) + [
        "--load_model", ckpt]
    opt = build_reference_opt(args)
    det = build_reference_detector(opt)

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
        log(f"[ref/{node}] video{vid}: MOTA {m['mota']:.3f} "
            f"IDF1 {m['idf1']:.3f}")
    overall = combine_metrics(summaries, accs)
    log(f"[ref/{node}] OVERALL: MOTA {overall['mota']:.3f} "
        f"IDF1 {overall['idf1']:.3f}")
    return overall


# -------------------------------------------------------------- our side

def train_eval_ours(ann_path, img_dir, node, epochs, batch_size=8,
                    lr=5e-4, log=print, save_ckpt="", seed=317):
    """Train + evaluate our framework with the selftest path."""
    from centertrack_tpu.tools.selftest import build_cfg, evaluate, train

    cfg = build_cfg(ann_path, img_dir, dla_node=node, batch_size=batch_size,
                    lr=lr, epochs=epochs, seed=seed)
    params, batch_stats = train(cfg, epochs, log=log)
    if save_ckpt:
        from centertrack_tpu.models.model import save_model

        save_model(save_ckpt, epochs, params, batch_stats)
    return evaluate(cfg, params, batch_stats, ann_path, img_dir, log=log)


# ------------------------------------------------------------------ main

def run_leg(node, root, epochs, do_ours=True, do_ref=True, log=print,
            num_videos=6, frames=24, ours_seeds=(317,),
            ref_seeds=(317,)):
    """One parity leg. `ours_seeds`/`ref_seeds` with several entries
    train that side once per seed and report the mean MOTA (plus the
    per-seed draws), so a single lucky/unlucky SGD draw at this tiny
    scale does not masquerade as a framework difference (measured
    seed-to-seed sigma is ~0.01 MOTA on this domain)."""
    ann_path, img_dir = make_domain(root, num_videos=num_videos,
                                    frames=frames)
    out = {"node": node, "epochs": epochs}
    if do_ref:
        t0 = time.time()
        motas, idf1s = [], []
        for seed in ref_seeds:
            ckpt = os.path.join(root, f"ref_{node}_{seed}.pth")
            train_reference(ann_path, img_dir, node, epochs, ckpt,
                            log=log, seed=seed)
            m = eval_reference(ckpt, ann_path, img_dir, node, log=log)
            log(f"[ref/{node}] seed {seed}: MOTA {m['mota']:.4f} "
                f"IDF1 {m['idf1']:.4f}")
            motas.append(m["mota"])
            idf1s.append(m["idf1"])
        out["ref_train_s"] = round(time.time() - t0, 1)
        out["ref_mota"] = round(float(np.mean(motas)), 4)
        out["ref_idf1"] = round(float(np.mean(idf1s)), 4)
        out["ref_mota_seeds"] = {str(s): round(m, 4) for s, m
                                 in zip(ref_seeds, motas)}
    if do_ours:
        t0 = time.time()
        motas, idf1s = [], []
        for seed in ours_seeds:
            m = train_eval_ours(ann_path, img_dir, node, epochs,
                                log=log, seed=seed)
            log(f"[ours/{node}] seed {seed}: MOTA {m['mota']:.4f} "
                f"IDF1 {m['idf1']:.4f}")
            motas.append(m["mota"])
            idf1s.append(m["idf1"])
        out["ours_train_eval_s"] = round(time.time() - t0, 1)
        out["ours_mota"] = round(float(np.mean(motas)), 4)
        out["ours_idf1"] = round(float(np.mean(idf1s)), 4)
        out["ours_mota_seeds"] = {str(s): round(m, 4) for s, m
                                  in zip(ours_seeds, motas)}
    if do_ours and do_ref:
        out["delta_mota"] = round(out["ours_mota"] - out["ref_mota"], 4)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", default="conv")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--workdir", default="")
    p.add_argument("--out", default="docs/parity_mota.json")
    p.add_argument("--skip_ours", action="store_true")
    p.add_argument("--skip_ref", action="store_true")
    p.add_argument("--ours_seeds", default="317",
                   help="comma list of init/shuffle seeds for our side; "
                        "several seeds -> mean MOTA + per-seed draws")
    p.add_argument("--ref_seeds", default="317",
                   help="comma list of torch seeds for the reference "
                        "side (same pooling semantics as --ours_seeds)")
    args = p.parse_args(argv)
    ours_seeds = tuple(int(s) for s in args.ours_seeds.split(","))
    ref_seeds = tuple(int(s) for s in args.ref_seeds.split(","))

    import tempfile

    payload = {"protocol": {
        "domain": "DISCRIMINATIVE selftest MOT (6 videos x 24 frames, "
                  "96x160, seed 0, tools/selftest.make_dataset "
                  "hard=True: 8-12 objects, z-order occlusion "
                  "crossings, mid-sequence births/deaths, scale/aspect "
                  "drift — VERDICT r4 item 5)",
        "schedule": f"Adam lr 5e-4, batch 8, {args.epochs} epochs, "
                    "hm_disturb 0.05 lost_disturb 0.4 fp_disturb 0.1, "
                    "same_aug_pre, not_rand_crop, no flip, pre_hm",
        "eval": "track_thresh/new_thresh 0.3, max_age 3; hermetic "
                "CLEAR-MOT (eval/mot_metrics.py), active tracks only",
        "reference": "real src/lib trainer+detector in torch CPU with "
                     "tests/torch_ref.DCN standing in for the CUDA "
                     "DCNv2 submodule",
    }, "legs": []}
    for node in args.nodes.split(","):
        root = args.workdir or tempfile.mkdtemp(prefix=f"parity_{node}_")
        leg = run_leg(node, root, args.epochs,
                      do_ours=not args.skip_ours,
                      do_ref=not args.skip_ref,
                      ours_seeds=ours_seeds, ref_seeds=ref_seeds)
        payload["legs"].append(leg)
        print(json.dumps(leg))
        if args.out:
            existing = {}
            if os.path.exists(args.out):
                with open(args.out) as f:
                    existing = json.load(f)
            merged = {l["node"]: l for l in existing.get("legs", [])}
            for l in payload["legs"]:
                prev = merged.get(l["node"], {})
                # split invocations (--skip_ours / --skip_ref / extra
                # seeds) merge into one leg: pool the per-seed draws
                # from both halves and recompute the means, so extra
                # draws ACCUMULATE instead of overwriting (prior
                # single-draw artifacts count as their seed-317 draw)
                for side in ("ref", "ours"):
                    key = f"{side}_mota_seeds"
                    for d in (prev, l):
                        if f"{side}_mota" in d and key not in d:
                            d[key] = {"317": d[f"{side}_mota"]}
                    if key in prev and key in l:
                        l[key] = {**prev[key], **l[key]}
                    if key in l:
                        l[f"{side}_mota"] = round(float(np.mean(
                            list(l[key].values()))), 4)
                prev.update(l)
                if "ref_mota" in prev and "ours_mota" in prev:
                    prev["delta_mota"] = round(
                        prev["ours_mota"] - prev["ref_mota"], 4)
                merged[l["node"]] = prev
            existing["protocol"] = payload["protocol"]
            existing["legs"] = list(merged.values())
            with open(args.out, "w") as f:
                json.dump(existing, f, indent=1)
    return payload


if __name__ == "__main__":
    main()
