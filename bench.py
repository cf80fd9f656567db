"""Benchmark: DLA-34 tracking at MOT17 resolution (544x960), one TPU chip.

Reference headline: 22 FPS on TITAN Xp (README.md:36-39; 45 ms/frame,
MODEL_ZOO.md:16). Honest workload (round-3 protocol): TRAINED weights
(committed selftest checkpoints in assets/), synthetic 1080p video
frames in the training domain (moving rectangles at training object
scale, per-frame sensor noise), and EVERY frame's results fetched to
host inside the timed loop with a one-frame pipeline lag — so pre_hm
rendering, device association with live tracks, and result readback
are all inside the measurement (reference timing protocol:
src/lib/detector.py:56-172).

Primary: engine/fused.py with the dcn_local1 node and weights TRAINED
with that node. chunk4 runs the same engine's run_chunk mode (one
lax.scan dispatch per 4 frames, every frame's results still fetched).
Secondaries (detached child, stable result path):
  - dcn_mix   : per-level exact/clamped mix, dcn-trained weights
  - dcn       : full exact gather DCNv2, dcn-trained weights
  - multi-stream: 6 concurrent streams, aggregate fps

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

# persistent XLA compile cache (no-op if the backend can't serialize
# executables; saves minutes per run when it can) — set before jax loads
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np

BASELINE_FPS = 22.0  # reference MOT17 tracking FPS (TITAN Xp)

SECONDARY_TIMEOUT_S = 1500
SECONDARY_RESULT_PATH = "/tmp/centertrack_secondary_bench.json"

ROOT = os.path.dirname(os.path.abspath(__file__))
CKPT_LOCAL1 = os.path.join(ROOT, "assets", "selftest_local1_fp16.ckpt")
CKPT_DCN = os.path.join(ROOT, "assets", "selftest_dcn_fp16.ckpt")


def _mot_meta():
    class MOTMeta:
        num_categories = 1
        default_resolution = [544, 960]
        num_joints = 17
        rest_focal_length = 1200
        flip_idx = []
        mean = np.array([0.40789654, 0.44719302, 0.47026115], np.float32)
        std = np.array([0.28863828, 0.27408164, 0.27809835], np.float32)
    return MOTMeta


def synth_frames(n, height=1080, width=1920, n_obj=10, seed=0):
    """Deterministic 1080p clip in the committed checkpoints' training
    domain: moving filled rectangles with center dots on a noisy gray
    background (tools/selftest.py make_dataset visuals). Object sizes
    are chosen so the 1080p -> 544x960 input warp lands them at the
    16-30 x 12-22 px scale the checkpoints were trained on."""
    rng = np.random.RandomState(seed)
    pos = rng.uniform([0, 0], [width - 120, height - 90], (n_obj, 2))
    vel = rng.uniform(-4, 4, (n_obj, 2))
    size = rng.uniform([32, 24], [60, 44], (n_obj, 2))
    colors = rng.randint(40, 220, (n_obj, 3))
    frames = []
    for f in range(n):
        img = rng.randint(180, 220, (height, width, 3), np.uint8)
        for o in range(n_obj):
            x, y = pos[o] + vel[o] * f
            w, h = size[o]
            x = int(np.clip(x, 0, width - w))
            y = int(np.clip(y, 0, height - h))
            img[y:y + int(h), x:x + int(w)] = colors[o]
            cy, cx = y + int(h) // 2, x + int(w) // 2
            img[max(0, cy - 3):cy + 3, max(0, cx - 3):cx + 3] = 255
        frames.append(img)
    return frames


def load_ckpt(path):
    """(params, batch_stats) as fp32 numpy trees, or (None, None)."""
    if not os.path.exists(path):
        import sys
        print(f"WARNING: {path} missing — benching RANDOM weights "
              f"(no live tracks; regenerate with "
              f"tools/make_bench_ckpt)", file=sys.stderr)
        return None, None
    import pickle
    with open(path, "rb") as f:
        d = pickle.load(f)

    def cast(t):
        if isinstance(t, dict):
            return {k: cast(v) for k, v in t.items()}
        a = np.asarray(t)
        return a.astype(np.float32) if a.dtype == np.float16 else a

    return cast(d["params"]), cast(d["batch_stats"])


def build_detector(node, ckpt_path, track_thresh=0.3):
    from centertrack_tpu.config import Config, parse_task, set_heads
    from centertrack_tpu.engine.fused import FusedDetector

    meta = _mot_meta()
    cfg = Config(task="tracking", pre_hm=True, track_thresh=track_thresh,
                 new_thresh=track_thresh, max_age=3,
                 compute_dtype="bfloat16", dla_node=node)
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, meta)
    params, bs = load_ckpt(ckpt_path)
    det = FusedDetector(cfg, params=params, batch_stats=bs,
                        dataset_meta=meta)
    return det, cfg, params is not None


def timed_tracking(det, cfg, frames, iters, warmup=5, lag=4):
    """Stream frames with EVERY frame's results fetched, `lag` frames
    behind dispatch (the packed result row is copied to host
    asynchronously at run() time; a small pipeline depth hides the
    device completion + transfer latency, like any real-time consumer).
    Measured sweep on v5e/axon: lag 2/3/4/6 = 56.9/66.3/68.3/68.3 fps
    on the dcn_local1 headline — lag 4 saturates. Returns
    (fps, mean live tracks per frame)."""
    import collections
    import jax.numpy as jnp
    dev_frames = [jnp.asarray(f) for f in frames]
    pend = collections.deque()
    for i in range(warmup):
        pend.append(det.run(dev_frames[i % len(dev_frames)]))
        if len(pend) > lag:
            det.fetch(pend.popleft(), cfg.out_thresh)
    while pend:
        det.fetch(pend.popleft(), cfg.out_thresh)
    live = []
    t0 = time.time()
    for i in range(iters):
        pend.append(det.run(dev_frames[(warmup + i) % len(dev_frames)]))
        if len(pend) > lag:
            live.append(len(det.fetch(pend.popleft(), cfg.out_thresh)))
    while pend:
        live.append(len(det.fetch(pend.popleft(), cfg.out_thresh)))
    dt = time.time() - t0
    return iters / dt, float(np.mean(live))


def timed_tracking_chunked(det, cfg, frames, iters, chunk=4, warmup=3):
    """run_chunk protocol: ONE dispatch advances `chunk` frames (lax.scan
    over time on device); EVERY frame's results are still fetched, one
    chunk behind dispatch — i.e. results stream out within 2*chunk
    frames of capture, the same order of delay as the per-frame mode's
    lag-4 async fetch. `iters` counts chunks; fps counts frames.
    Returns (fps, mean live tracks per frame)."""
    import collections
    import jax.numpy as jnp
    n = len(frames)
    dev_chunks = [jnp.asarray(np.stack(
        [frames[(i * chunk + j) % n] for j in range(chunk)]))
        for i in range((n + chunk - 1) // chunk)]
    pend = collections.deque()
    for i in range(warmup):
        pend.append(det.run_chunk(dev_chunks[i % len(dev_chunks)]))
        if len(pend) > 1:
            det.fetch_chunk(pend.popleft(), cfg.out_thresh)
    while pend:
        det.fetch_chunk(pend.popleft(), cfg.out_thresh)
    live = []
    t0 = time.time()
    for i in range(iters):
        pend.append(det.run_chunk(
            dev_chunks[(warmup + i) % len(dev_chunks)]))
        if len(pend) > 1:
            for fr in det.fetch_chunk(pend.popleft(), cfg.out_thresh):
                live.append(len(fr))
    while pend:
        for fr in det.fetch_chunk(pend.popleft(), cfg.out_thresh):
            live.append(len(fr))
    dt = time.time() - t0
    return iters * chunk / dt, float(np.mean(live))


def _secondary(out_path):
    """Child-process entry: dcn_mix + exact dcn + multi-stream, all on
    trained weights and honest frames; one JSON payload to out_path."""
    import jax.numpy as jnp
    payload = {"ts": time.time()}
    frames = synth_frames(24)

    for node, ckpt in (("dcn_mix", CKPT_DCN), ("dcn", CKPT_DCN)):
        det, cfg, trained = build_detector(node, ckpt)
        fps, live = timed_tracking(det, cfg, frames, iters=30)
        payload[f"{node}_fps"] = round(fps, 2)
        payload[f"{node}_live_tracks"] = round(live, 1)
        payload[f"{node}_trained"] = trained
        with open(out_path, "w") as f:   # partial results survive
            json.dump(payload, f)

    # ---- multi-stream throughput (S concurrent videos) --------------
    from centertrack_tpu.engine.fused import MultiStreamDetector
    from centertrack_tpu.config import Config, parse_task, set_heads
    meta = _mot_meta()
    cfg = Config(task="tracking", pre_hm=True, track_thresh=0.3,
                 new_thresh=0.3, max_age=3, compute_dtype="bfloat16",
                 dla_node="dcn_local1")
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, meta)
    params, bs = load_ckpt(CKPT_LOCAL1)
    # S sweep on v5e/axon (trained ckpt, lag-4 honest protocol):
    # S=4 91.9 / S=6 97.8 / S=8 75.7 aggregate fps (S=8 falls off a
    # memory cliff). Lag sweep at S=6: 4/6/8/12 -> 97.4/97.8/97.8/97.5.
    streams = 6
    det = MultiStreamDetector(cfg, streams, params=params,
                              batch_stats=bs, dataset_meta=meta)
    stk = [jnp.asarray(np.stack([frames[(i + 5 * s) % len(frames)]
                                 for s in range(streams)]))
           for i in range(len(frames))]
    import collections
    lag = 4
    pend = collections.deque()
    for i in range(4):
        pend.append(det.run(stk[i]))
        if len(pend) > lag:
            det.fetch_all(pend.popleft(), cfg.out_thresh)
    while pend:
        det.fetch_all(pend.popleft(), cfg.out_thresh)
    iters = 30
    t0 = time.time()
    for i in range(iters):
        pend.append(det.run(stk[(4 + i) % len(stk)]))
        if len(pend) > lag:
            det.fetch_all(pend.popleft(), cfg.out_thresh)
    while pend:
        det.fetch_all(pend.popleft(), cfg.out_thresh)
    agg = streams * iters / (time.time() - t0)
    payload["multi_stream_fps"] = round(agg, 2)
    payload["multi_stream_n"] = streams
    payload["ts"] = time.time()
    with open(out_path, "w") as f:
        json.dump(payload, f)


def _secondary_subprocess():
    """Run secondaries in a detached child; dict (possibly stale) or {}.
    The child is never killed: SIGTERM mid-TPU-compile can wedge the
    axon tunnel, so on timeout it is abandoned (it exits on its own)
    and a previous/late result is picked up from the stable path."""
    import subprocess
    import sys as _sys
    t_start = time.time()
    child = subprocess.Popen(
        [_sys.executable, os.path.abspath(__file__), "--secondary",
         SECONDARY_RESULT_PATH],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True)
    timed_out = False
    try:
        child.wait(SECONDARY_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        timed_out = True
        print(f"secondary bench still running after "
              f"{SECONDARY_TIMEOUT_S}s; abandoning (not killed)",
              file=_sys.stderr)
    try:
        with open(SECONDARY_RESULT_PATH) as f:
            payload = json.load(f)
        stale = timed_out or payload.get("ts", 0) < t_start
        if stale and time.time() - payload.get("ts", 0) > 86400:
            return {}
        if stale:
            payload["secondary_stale"] = True
        payload.pop("ts", None)
        return payload
    except Exception:
        return {}


def main():
    import sys
    det, cfg, trained = build_detector("dcn_local1", CKPT_LOCAL1)
    frames = synth_frames(24)
    fps, live = timed_tracking(det, cfg, frames, iters=60)
    print(f"headline: {fps:.2f} fps, {live:.1f} live tracks/frame, "
          f"trained={trained}", file=sys.stderr)
    cfps, clive = timed_tracking_chunked(det, cfg, frames, iters=20,
                                         chunk=4)
    print(f"chunk4: {cfps:.2f} fps, {clive:.1f} live tracks/frame",
          file=sys.stderr)

    out = {
        "metric": "MOT17_tracking_FPS_dla34_544x960_1chip_fused",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "live_tracks_per_frame": round(live, 1),
        "trained_weights": trained,
        "chunk4_fps": round(cfps, 2),
        "chunk4_live_tracks": round(clive, 1),
    }
    out.update(_secondary_subprocess())
    if "dcn_fps" in out:
        out["exact_dcn_fps"] = out.pop("dcn_fps")
        out["exact_dcn_vs_baseline"] = round(
            out["exact_dcn_fps"] / BASELINE_FPS, 3)
    if "dcn_mix_fps" in out:
        out["mix_dcn_vs_baseline"] = round(
            out["dcn_mix_fps"] / BASELINE_FPS, 3)
        # dcn_mix is the recommended serving mode for exact-trained /
        # converted checkpoints: exact gather on the stride-16/32 maps
        # where trained offsets exceed 2 px, MOTA-neutral +/-2 px clamp
        # on the fine maps (measured: docs/dcn_drift_trained.json).
        out["exact_serving_fps"] = out["dcn_mix_fps"]
    print(json.dumps(out))


if __name__ == "__main__":
    import sys
    if len(sys.argv) >= 3 and sys.argv[1] == "--secondary":
        _secondary(sys.argv[2])
    else:
        main()
