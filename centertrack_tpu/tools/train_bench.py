"""Training-step throughput benchmark: img/s on one chip.

The reference documents training cost per model (reference:
readme/MODEL_ZOO.md:16-20 — e.g. mot17_half: 4 GPU x 2 h); this tool
gives the equivalent driver-visible number for the TPU framework.

Protocol: MOT17 geometry (1080p frames -> 544x960 input, 1 class,
tracking task with pre_hm), dla_34, bf16 compute. One REAL batch is
produced by the production data pipeline (GenericDataset splat
descriptors from a synthetic 1080p domain), uploaded once, and the
jitted donated train step (engine/trainer.py) is timed over --iters
steps: each step consumes the previous step's state, so fetching the
final loss bounds the whole chain. This measures the DEVICE optimizer
step (forward + GT render + backward + Adam), i.e. throughput with a
non-starved input pipeline; host-side loading is excluded (this box
has one CPU core, so an in-loop loader measures the box, not the
framework).

Usage:
  python -m centertrack_tpu.tools.train_bench \
      [--nodes dcn_local1 dcn] [--batches 8 16] [--iters 20] \
      [--out docs/train_bench.json]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def build_cfg(ann_path, img_dir, node, batch_size, grad_checkpoint=False,
              input_h=544, input_w=960, grad_accum=1):
    from centertrack_tpu.config import Config, parse_task, set_heads

    cfg = Config(
        task="tracking", dataset="custom", pre_hm=True,
        custom_dataset_ann_path=ann_path, custom_dataset_img_path=img_dir,
        num_classes=1, input_h=input_h, input_w=input_w,
        dla_node=node, compute_dtype="bfloat16",
        batch_size=batch_size, grad_checkpoint=grad_checkpoint,
        grad_accum=grad_accum,
        hm_disturb=0.05, lost_disturb=0.4, fp_disturb=0.1,
        same_aug_pre=True, not_rand_crop=True, flip=0.0)
    cfg = parse_task(cfg)
    return set_heads(cfg, type("M", (), {
        "num_categories": 1, "default_resolution": (input_h, input_w),
        "num_joints": 17}))


def make_domain(root, width=1920, height=1080):
    """Synthetic 1080p MOT domain (bench.py's object scale)."""
    from centertrack_tpu.tools.selftest import make_dataset

    return make_dataset(root, num_videos=2, frames=12,
                        width=width, height=height, seed=0)


def grab_batch(cfg, batch_size):
    from centertrack_tpu.data.datasets import CustomDataset
    from centertrack_tpu.data.loader import DataLoader

    ds = CustomDataset(cfg, "train")
    loader = DataLoader(ds, batch_size, shuffle=True, num_workers=0)
    return next(iter(loader))


def time_steps(cfg, batch, iters, warmup=3, log=print):
    """Returns (ms/step, img/s) for the jitted train step."""
    from centertrack_tpu.engine.trainer import Trainer
    from centertrack_tpu.models.model import create_model, init_model
    from centertrack_tpu.parallel.mesh import shard_batch

    model = create_model(cfg.arch, cfg.heads_dict, cfg.head_convs_dict,
                         cfg)
    params, batch_stats = init_model(model, cfg)
    trainer = Trainer(cfg, model, params, batch_stats)
    batch = shard_batch(batch, trainer.mesh)  # uploads once

    lr = cfg.lr
    t_c = time.time()
    for _ in range(warmup):
        trainer.state, losses = trainer._train_step(trainer.state, batch,
                                                    lr)
    # axon: block_until_ready does not sync through the tunnel — force
    # a host copy of the scalar loss to bound the dispatched chain.
    np.asarray(losses["tot"])
    log(f"  compiled + warm in {time.time() - t_c:.0f}s")

    t0 = time.time()
    for _ in range(iters):
        trainer.state, losses = trainer._train_step(trainer.state, batch,
                                                    lr)
    tot = float(np.asarray(losses["tot"]))  # syncs the whole chain
    dt = time.time() - t0
    ms = dt / iters * 1e3
    return ms, cfg.batch_size / (dt / iters), tot


def time_steps_accum(cfg, batch, iters, warmup=2, log=print):
    """(ms/step, img/s) for the gradient-accumulation path: one
    optimizer step = cfg.grad_accum sequential micro-batch grad steps
    + one apply (engine/trainer.py _grad_step/_apply_step). The micro
    batches are pre-sharded on device ONCE — through the axon tunnel
    a per-step host upload would measure the 54 MB/s H2D link, not the
    device (production keeps the loader pipelined)."""
    from centertrack_tpu.engine.trainer import Trainer
    from centertrack_tpu.models.model import create_model, init_model
    from centertrack_tpu.parallel.mesh import shard_batch

    model = create_model(cfg.arch, cfg.heads_dict, cfg.head_convs_dict,
                         cfg)
    params, batch_stats = init_model(model, cfg)
    trainer = Trainer(cfg, model, params, batch_stats)
    accum = trainer.accum
    n = next(v.shape[0] for v in batch.values()
             if hasattr(v, "shape") and v.ndim > 0)
    m = n // accum
    micros = [shard_batch({k: (v[i * m:(i + 1) * m]
                               if hasattr(v, "shape") and v.ndim > 0
                               else v) for k, v in batch.items()},
                          trainer.mesh)
              for i in range(accum)]

    def one_step(lr):
        state = trainer.state
        gsum = trainer._grad_zeros(state.params)
        bs = state.batch_stats
        for mb in micros:
            gsum, bs, losses = trainer._grad_step(state.params, bs, mb,
                                                  gsum)
        trainer.state = trainer._apply_step(state, gsum, bs, lr)
        return losses

    t_c = time.time()
    for _ in range(warmup):
        losses = one_step(cfg.lr)
    np.asarray(losses["tot"])  # axon: force a sync of the chain
    log(f"  compiled + warm in {time.time() - t_c:.0f}s")
    t0 = time.time()
    for _ in range(iters):
        losses = one_step(cfg.lr)
    tot = float(np.asarray(losses["tot"]))
    dt = time.time() - t0
    ms = dt / iters * 1e3
    return ms, n / (dt / iters), tot


def run_leg(ann_path, img_dir, node, batch_size, iters, log=print,
            input_h=544, input_w=960, grad_accum=1):
    leg = {"node": node, "batch": batch_size, "remat": False,
           "input": f"{input_h}x{input_w}"}
    if grad_accum > 1:
        leg["grad_accum"] = grad_accum
        leg["micro_batch"] = batch_size // grad_accum
    impl = os.environ.get("CT_LOCAL_IMPL", "")
    if impl and node.startswith("dcn_local"):
        leg["local_impl"] = impl  # fused (default) vs taploop A/B
    cfg = build_cfg(ann_path, img_dir, node, batch_size,
                    input_h=input_h, input_w=input_w,
                    grad_accum=grad_accum)
    batch = grab_batch(cfg, batch_size)
    timer = time_steps_accum if grad_accum > 1 else time_steps
    try:
        ms, ips, tot = timer(cfg, batch, iters, log=log)
    except Exception as e:  # HBM OOM at large batch -> retry w/ remat
        log(f"  {node} B={batch_size} failed ({type(e).__name__}); "
            f"retrying with grad_checkpoint")
        cfg = build_cfg(ann_path, img_dir, node, batch_size,
                        grad_checkpoint=True,
                        input_h=input_h, input_w=input_w,
                        grad_accum=grad_accum)
        ms, ips, tot = timer(cfg, batch, iters, log=log)
        leg["remat"] = True
    leg.update(ms_per_step=round(ms, 1), img_per_s=round(ips, 2),
               loss=round(tot, 4))
    log(f"  {node} B={batch_size}: {ms:.1f} ms/step, "
        f"{ips:.2f} img/s{' (remat)' if leg['remat'] else ''}")
    return leg


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", nargs="*", default=["dcn_local1", "dcn"])
    p.add_argument("--batches", nargs="*", type=int, default=[8, 16])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--out", default="docs/train_bench.json")
    p.add_argument("--root", default="")
    p.add_argument("--input_h", type=int, default=544)
    p.add_argument("--input_w", type=int, default=960)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="micro-batches per optimizer step (effective "
                        "batch = --batches value; micro = batch/accum)")
    args = p.parse_args(argv)

    root = args.root or tempfile.mkdtemp(prefix="ct_trainbench_")
    ann_path, img_dir = make_domain(root, width=2 * args.input_w,
                                    height=max(2 * args.input_h, 1))

    payload = {
        "protocol": (
            "dla_34 tracking train step on one chip: 544x960 input, "
            "1 class, pre_hm, bf16 compute, Adam; one real "
            "GenericDataset batch (synthetic 1080p domain) uploaded "
            "once; jitted donated step timed over N state-chained "
            "iterations (device throughput, host loader excluded); "
            "reference train-cost columns: readme/MODEL_ZOO.md:16-20"),
        "iters": args.iters,
        "legs": [],
    }
    # the reference's train-cost anchor: mot17_half trains 70 epochs of
    # ~2.6k images in 2 h on 4 TITAN V (readme/MODEL_ZOO.md:16-20)
    # ~= 26 img/s total = 6.5 img/s per GPU
    payload["reference_anchor"] = {
        "source": "readme/MODEL_ZOO.md:16-20 (mot17_half: 4x TITAN V, "
                  "2h, 70 epochs x ~2.7k images, batch 32)",
        "ref_img_per_s_total": 26.0,
        "ref_img_per_s_per_gpu": 6.5,
    }
    if args.out and os.path.exists(args.out):  # merge over prior runs
        with open(args.out) as f:
            prior = json.load(f)
            payload["legs"] = prior.get("legs", [])
            payload["failed_legs"] = prior.get("failed_legs", [])
    payload.setdefault("failed_legs", [])
    # one-time cleanup: crash logs recorded as legs by older runs move
    # to failed_legs with ANSI escapes stripped
    import re
    ansi = re.compile(r"\x1b\[[0-9;]*m")
    for l in [l for l in payload["legs"] if "error" in l]:
        payload["legs"].remove(l)
        l["error"] = ansi.sub("", l["error"]).split("\n")[0][:160]
        payload["failed_legs"].append(l)

    def put(leg):
        k = lambda l: (l["node"], l["batch"], l.get("input", "544x960"),
                       l.get("local_impl", ""), l.get("grad_accum", 1))
        dst = "failed_legs" if "error" in leg else "legs"
        for coll in ("legs", "failed_legs"):
            payload[coll] = [l for l in payload[coll] if k(l) != k(leg)]
        payload[dst].append(leg)

    for node in args.nodes:
        for b in args.batches:
            try:
                put(run_leg(ann_path, img_dir, node, b, args.iters,
                            input_h=args.input_h, input_w=args.input_w,
                            grad_accum=args.grad_accum))
            except Exception as e:  # record and keep going
                print(f"  {node} B={b} FAILED: {type(e).__name__}")
                leg = {"node": node, "batch": b,
                       "input": f"{args.input_h}x{args.input_w}",
                       "error": ansi.sub(
                           "", f"{type(e).__name__}: {e}"
                       ).split("\n")[0][:160]}
                if args.grad_accum > 1:
                    leg["grad_accum"] = args.grad_accum
                put(leg)
            if args.out:
                os.makedirs(os.path.dirname(args.out) or ".",
                            exist_ok=True)
                payload["ts"] = time.time()
                with open(args.out, "w") as f:
                    json.dump(payload, f, indent=1)
    print(json.dumps(payload["legs"]))
    return payload


if __name__ == "__main__":
    main()
