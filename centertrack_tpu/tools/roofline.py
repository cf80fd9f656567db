"""Roofline analysis for the tracking pipeline on TPU.

Answers VERDICT r2's "what is the attainable number?" question with
compiler data instead of hand-waving: lowers the FusedDetector step
(warp -> pre_hm render -> network -> decode -> association) for a given
node type / batch, reads XLA's cost analysis (flops + bytes accessed),
and reports the roofline bounds

    t_compute = flops / PEAK_FLOPS      (MXU-bound limit)
    t_memory  = bytes / PEAK_HBM_BW     (HBM-bound limit)
    fps_roof  = 1 / max(t_compute, t_memory)

against the measured fps (--measure). The gap between fps_roof and the
measurement is dispatch latency + serialization XLA could not fuse
away — the quantity multi-streaming (engine/fused.MultiStreamDetector)
amortizes.

Peaks default to TPU v5e: 394 TFLOP/s bf16, 819 GB/s HBM.

Usage:
  python -m centertrack_tpu.tools.roofline \
      [--nodes dcn_local1 dcn_mix dcn] [--streams 1 4 8] \
      [--measure] [--out /tmp/roofline.json]
"""

from __future__ import annotations

import argparse
import collections
import json
import time

import numpy as np

PEAK_FLOPS = 394e12   # v5e bf16
PEAK_BW = 819e9       # v5e HBM bytes/s


def _meta():
    class MOTMeta:
        num_categories = 1
        default_resolution = [544, 960]
        num_joints = 17
        rest_focal_length = 1200
        flip_idx = []
        mean = np.array([0.40789654, 0.44719302, 0.47026115],
                        np.float32)
        std = np.array([0.28863828, 0.27408164, 0.27809835], np.float32)
    return MOTMeta


def _build(node, streams):
    from centertrack_tpu.config import Config, parse_task, set_heads
    from centertrack_tpu.engine.fused import (FusedDetector,
                                              MultiStreamDetector)
    cfg = Config(task="tracking", pre_hm=True, track_thresh=0.3,
                 new_thresh=0.3, max_age=3, compute_dtype="bfloat16",
                 dla_node=node)
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, _meta())
    if streams == 1:
        det = FusedDetector(cfg, dataset_meta=_meta())
    else:
        det = MultiStreamDetector(cfg, streams, dataset_meta=_meta())
    return det, cfg


def _cost(det, cfg, streams, h=1080, w=1920):
    """Lower the step once and read XLA's cost analysis."""
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    if streams == 1:
        frame = rng.randint(0, 255, (h, w, 3), np.uint8)
        r = det.run(jnp.asarray(frame))     # builds + compiles
    else:
        stack = rng.randint(0, 255, (streams, h, w, 3), np.uint8)
        r = det.run(jnp.asarray(stack))
    np.asarray(r)
    shape = (streams, h, w, 3) if streams > 1 else (h, w, 3)
    step = det._step[shape]
    # jitted function was already executed -> pull the cached lowering
    ca = None
    try:
        ca = step.lower(
            det.params, det.batch_stats,
            *_example_rest(det, cfg, streams, h, w)).compile(
            ).cost_analysis()
    except Exception:
        pass
    if isinstance(ca, list):       # older jax returns [dict]
        ca = ca[0] if ca else None
    return ca


def _example_rest(det, cfg, streams, h, w):
    """The non-param step arguments, matching run()'s construction."""
    import jax.numpy as jnp
    from centertrack_tpu.ops.affine import (get_affine_transform,
                                            invert_affine)
    c = np.array([w / 2.0, h / 2.0], np.float32)
    s = float(max(h, w))
    trans_input = get_affine_transform(
        c, s, 0, [cfg.input_w, cfg.input_h]).astype(np.float32)
    inv_trans_input = invert_affine(trans_input).astype(np.float32)
    out_w, out_h = cfg.input_w // cfg.down_ratio, \
        cfg.input_h // cfg.down_ratio
    inv_trans_output = get_affine_transform(
        c, s, 0, [out_w, out_h], inv=1).astype(np.float32)
    if streams == 1:
        frame = jnp.zeros((h, w, 3), jnp.uint8)
        return (frame, jnp.asarray(inv_trans_input),
                jnp.asarray(trans_input), jnp.asarray(inv_trans_output),
                det.pre_images, det.track_state)
    tile = lambda m: jnp.asarray(
        np.broadcast_to(m, (streams,) + m.shape))
    frames = jnp.zeros((streams, h, w, 3), jnp.uint8)
    fresh = jnp.zeros((streams,), bool)
    return (frames, tile(inv_trans_input), tile(trans_input),
            tile(inv_trans_output), fresh, det.pre_images,
            det.track_state)


def _measure(det, cfg, streams, iters=30, h=1080, w=1920):
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    if streams == 1:
        frames = [jnp.asarray(rng.randint(0, 255, (h, w, 3), np.uint8))
                  for _ in range(6)]
    else:
        frames = [jnp.asarray(rng.randint(
            0, 255, (streams, h, w, 3), np.uint8)) for _ in range(6)]
    fetch = (det.fetch if streams == 1
             else lambda r, t: det.fetch_all(r, t))
    pend = collections.deque()
    for i in range(5):
        pend.append(det.run(frames[i % 6]))
        if len(pend) > 3:
            fetch(pend.popleft(), cfg.out_thresh)
    while pend:
        fetch(pend.popleft(), cfg.out_thresh)
    t0 = time.time()
    for i in range(iters):
        pend.append(det.run(frames[i % 6]))
        if len(pend) > 3:
            fetch(pend.popleft(), cfg.out_thresh)
    while pend:
        fetch(pend.popleft(), cfg.out_thresh)
    return streams * iters / (time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", nargs="*", default=["dcn_local1"])
    ap.add_argument("--streams", nargs="*", type=int, default=[1])
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--peak_flops", type=float, default=PEAK_FLOPS)
    ap.add_argument("--peak_bw", type=float, default=PEAK_BW)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    report = {}
    for node in args.nodes:
        for streams in args.streams:
            det, cfg = _build(node, streams)
            ca = _cost(det, cfg, streams)
            entry = {}
            if ca:
                flops = float(ca.get("flops", 0.0))
                byts = float(ca.get("bytes accessed", 0.0))
                t_c = flops / args.peak_flops
                t_m = byts / args.peak_bw
                roof = streams / max(t_c, t_m) if max(t_c, t_m) else None
                entry.update({
                    "gflops_per_step": round(flops / 1e9, 2),
                    "gbytes_per_step": round(byts / 1e9, 3),
                    "arith_intensity": round(flops / byts, 1)
                    if byts else None,
                    "bound": "memory" if t_m > t_c else "compute",
                    "roofline_fps": round(roof, 1) if roof else None,
                })
            if args.measure:
                fps = _measure(det, cfg, streams)
                entry["measured_fps"] = round(fps, 2)
                if ca:
                    entry["mfu_pct"] = round(
                        100 * flops * fps / streams / args.peak_flops, 2)
                    entry["roofline_frac"] = round(
                        fps / entry["roofline_fps"], 3) \
                        if entry.get("roofline_fps") else None
            key = f"{node}@S{streams}"
            report[key] = entry
            print(key, json.dumps(entry), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
