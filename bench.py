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

SECONDARY_TIMEOUT_S = 2700  # 5 legs; worst case all-cold compiles
SECONDARY_RESULT_PATH = "/tmp/centertrack_secondary_bench.json"
SECONDARY_PID_PATH = "/tmp/centertrack_secondary_bench.pid"


def _contamination_probe():
    """Competing-work snapshot for a 1-core box: any OTHER process in
    run state R starves this bench's host loop and poisons the timing
    (r4 post-mortem: a deadlocked pytest held the core and collapsed
    the multi-stream leg 96.6 -> 29.9 aggregate fps with no flag).
    Returns {load1, busy: [pid:cmd...]} — busy excludes self and this
    bench's own children."""
    me = os.getpid()
    mine = {str(me)}
    try:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
    except OSError:
        load1 = -1.0
    busy = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or pid in mine:
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                after = f.read().rsplit(")", 1)[1].split()
            state = after[0]
            if state != "R":
                continue
            with open(f"/proc/{pid}/cmdline") as f:
                cmd = f.read().replace("\0", " ").strip()
            if not cmd:
                continue  # kernel thread (rcu etc.), not competing work
            busy.append(f"{pid}:{cmd[:80]}")
        except (OSError, IndexError):
            continue
    return {"load1": load1, "busy": busy}


def _guarded_leg(name, fn, sink, retries=1, settle_s=20):
    """Run one timed leg behind the contamination guard. Records
    {<name>_meta: {ts_start, wall_s, guard}} into sink; if competing
    run-state processes are seen, waits settle_s and re-probes, and if
    they persist the leg runs anyway but is flagged contaminated=true
    (refusing would lose the whole artifact; a flagged number is
    auditable)."""
    import sys as _sys
    probe = _contamination_probe()
    for _ in range(retries):
        if not probe["busy"]:
            break
        print(f"leg {name}: competing processes {probe['busy']}; "
              f"waiting {settle_s}s", file=_sys.stderr)
        time.sleep(settle_s)
        probe = _contamination_probe()
    ts0 = time.time()
    out = fn()
    meta = {"ts_start": round(ts0, 2),
            "wall_s": round(time.time() - ts0, 2),
            "load1_before": probe["load1"]}
    if probe["busy"]:
        meta["contaminated"] = True
        meta["competing"] = probe["busy"][:4]
    sink[f"{name}_meta"] = meta
    return out

ROOT = os.path.dirname(os.path.abspath(__file__))
CKPT_LOCAL1 = os.path.join(ROOT, "assets", "selftest_local1_fp16.ckpt")
CKPT_DCN = os.path.join(ROOT, "assets", "selftest_dcn_fp16.ckpt")
CKPT_DDD = os.path.join(ROOT, "assets", "selftest_ddd_fp16.ckpt")
CKPT_POSE = os.path.join(ROOT, "assets", "selftest_pose_fp16.ckpt")


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


def build_detector(node, ckpt_path, track_thresh=0.3, task="tracking",
                   meta=None, num_classes=-1):
    from centertrack_tpu.config import Config, parse_task, set_heads
    from centertrack_tpu.engine.fused import FusedDetector

    meta = meta or _mot_meta()
    cfg = Config(task=task, pre_hm=True, track_thresh=track_thresh,
                 new_thresh=track_thresh, max_age=3,
                 compute_dtype="bfloat16", dla_node=node,
                 num_classes=num_classes)
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, meta)
    params, bs = load_ckpt(ckpt_path)
    det = FusedDetector(cfg, params=params, batch_stats=bs,
                        dataset_meta=meta)
    return det, cfg, params is not None


def _nusc_meta():
    """nuScenes camera operating point (reference: README.md:47-51 —
    28 FPS monocular 3D at 448x800; dataset meta:
    src/lib/dataset/datasets/nuscenes.py:19-31)."""
    class NuscMeta:
        num_categories = 10
        default_resolution = [448, 800]
        num_joints = 17
        rest_focal_length = 1200
        flip_idx = []
        mean = np.array([0.40789654, 0.44719302, 0.47026115], np.float32)
        std = np.array([0.28863828, 0.27408164, 0.27809835], np.float32)
    return NuscMeta


def synth_frames_ddd(n=24):
    """One synthetic pinhole-camera clip (1600x900, the nuScenes
    camera geometry) from the SAME generator the ddd checkpoint was
    trained on (tools/selftest.make_dataset_ddd) — held-out seed."""
    import cv2
    import tempfile
    from centertrack_tpu.tools.selftest import make_dataset_ddd
    root = tempfile.mkdtemp(prefix="ct_benchddd_")
    ann_path, img_dir = make_dataset_ddd(root, num_videos=1, frames=n,
                                         seed=99)
    import json as _json
    with open(ann_path) as f:
        db = _json.load(f)
    ims = sorted(db["images"], key=lambda im: im["frame_id"])
    return [cv2.imread(os.path.join(img_dir, im["file_name"]))
            for im in ims]


def synth_frames_pose(n=24):
    """One synthetic mannequin clip (1280x720, the pose ckpt's training
    domain, tools/selftest.make_dataset_pose) — held-out seed."""
    import cv2
    import tempfile
    from centertrack_tpu.tools.selftest import make_dataset_pose
    root = tempfile.mkdtemp(prefix="ct_benchpose_")
    ann_path, img_dir = make_dataset_pose(root, num_videos=1, frames=n,
                                          seed=99)
    import json as _json
    with open(ann_path) as f:
        db = _json.load(f)
    ims = sorted(db["images"], key=lambda im: im["frame_id"])
    return [cv2.imread(os.path.join(img_dir, im["file_name"]))
            for im in ims]


def timed_tracking(det, cfg, frames, iters, warmup=5, lag=4,
                   fetch="fetch"):
    """Stream frames with EVERY frame's results fetched, `lag` frames
    behind dispatch (the packed result row is copied to host
    asynchronously at run() time; a small pipeline depth hides the
    device completion + transfer latency, like any real-time consumer).
    Measured sweep on v5e/axon: lag 2/3/4/6 = 56.9/66.3/68.3/68.3 fps
    on the dcn_local1 headline — lag 4 saturates. `fetch` names the
    materializer ('fetch_full' for ddd/pose legs: the richer host
    parse stays inside the measurement). Returns
    (fps, mean live tracks per frame)."""
    import collections
    import jax.numpy as jnp
    fetch_fn = getattr(det, fetch)
    dev_frames = [jnp.asarray(f) for f in frames]
    pend = collections.deque()
    for i in range(warmup):
        pend.append(det.run(dev_frames[i % len(dev_frames)]))
        if len(pend) > lag:
            fetch_fn(pend.popleft(), cfg.out_thresh)
    while pend:
        fetch_fn(pend.popleft(), cfg.out_thresh)
    live = []
    t0 = time.time()
    for i in range(iters):
        pend.append(det.run(dev_frames[(warmup + i) % len(dev_frames)]))
        if len(pend) > lag:
            live.append(len(fetch_fn(pend.popleft(), cfg.out_thresh)))
    while pend:
        live.append(len(fetch_fn(pend.popleft(), cfg.out_thresh)))
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
    try:
        with open(SECONDARY_PID_PATH, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass
    payload = {"ts": time.time()}
    frames = synth_frames(24)

    for node, ckpt in (("dcn_mix", CKPT_DCN), ("dcn", CKPT_DCN)):
        det, cfg, trained = build_detector(node, ckpt)
        fps, live = _guarded_leg(
            node, lambda: timed_tracking(det, cfg, frames, iters=30),
            payload)
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

    def ms_leg():
        t0 = time.time()
        for i in range(iters):
            pend.append(det.run(stk[(4 + i) % len(stk)]))
            if len(pend) > lag:
                det.fetch_all(pend.popleft(), cfg.out_thresh)
        while pend:
            det.fetch_all(pend.popleft(), cfg.out_thresh)
        return streams * iters / (time.time() - t0)

    agg = _guarded_leg("multi_stream", ms_leg, payload)
    payload["multi_stream_fps"] = round(agg, 2)
    payload["multi_stream_n"] = streams
    payload["ts"] = time.time()
    with open(out_path, "w") as f:
        json.dump(payload, f)

    # ---- nuScenes monocular-3D serving (tracking,ddd @ 448x800) ----
    # vs the reference's 28 FPS nuScenes 3D (README.md:47-51); the
    # on-device 3D lift + the richer fetch_full host parse are inside
    # the timed loop. track_thresh 0.1 is the reference's published
    # nuScenes 3D-tracking operating point
    # (reference: experiments/nuScenes_3Dtracking.sh:5).
    det, cfg, trained = build_detector(
        "dcn_local1", CKPT_DDD, task="tracking,ddd", meta=_nusc_meta(),
        num_classes=10, track_thresh=0.1)
    ddd_frames = synth_frames_ddd(24)
    fps, live = _guarded_leg(
        "nuscenes3d",
        lambda: timed_tracking(det, cfg, ddd_frames, iters=40,
                               fetch="fetch_full"), payload)
    payload["nuscenes3d_fps"] = round(fps, 2)
    payload["nuscenes3d_live_tracks"] = round(live, 1)
    payload["nuscenes3d_trained"] = trained
    payload["ts"] = time.time()
    with open(out_path, "w") as f:
        json.dump(payload, f)

    # ---- pose serving (tracking,multi_pose @ 512x512) ---------------
    # vs the reference's 33 ms multi_pose dla_1x (MODEL_ZOO.md:72);
    # hm_hp top-K snap + keypoint warp run on device, keypoints ride
    # the packed row. Frames come from the pose ckpt's training
    # domain (tools/selftest.make_dataset_pose, held-out seed) so the
    # tracker carries live tracks through the timed loop.
    class PoseMeta:
        num_categories = 1
        default_resolution = [512, 512]
        num_joints = 17
        rest_focal_length = 1200
        flip_idx = []
        mean = _mot_meta().mean
        std = _mot_meta().std
    det, cfg, trained = build_detector(
        "dcn_local1", CKPT_POSE, task="tracking,multi_pose",
        meta=PoseMeta)
    pose_frames = synth_frames_pose(24)
    fps, live = _guarded_leg(
        "pose",
        lambda: timed_tracking(det, cfg, pose_frames, iters=40,
                               fetch="fetch_full"), payload)
    payload["pose_fps"] = round(fps, 2)
    payload["pose_live_tracks"] = round(live, 1)
    payload["pose_trained"] = trained
    payload["ts"] = time.time()
    with open(out_path, "w") as f:
        json.dump(payload, f)
    try:
        os.remove(SECONDARY_PID_PATH)
    except OSError:
        pass


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


def _wait_for_stale_secondary(max_wait_s=900):
    """A DETACHED secondary child from a previous bench run may still
    hold the box's single core (CLAUDE.md hazard); wait for it before
    timing anything. Returns a note dict if one was found."""
    import sys as _sys
    try:
        with open(SECONDARY_PID_PATH) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return None
    note = None
    t0 = time.time()
    while os.path.exists(f"/proc/{pid}"):
        if note is None:
            note = {"stale_secondary_pid": pid, "waited_s": 0}
            print(f"previous bench's secondary (pid {pid}) still "
                  f"running; waiting", file=_sys.stderr)
        if time.time() - t0 > max_wait_s:
            note["still_running"] = True
            break
        time.sleep(10)
    if note:
        note["waited_s"] = round(time.time() - t0, 1)
    return note


def main():
    import sys
    stale_note = _wait_for_stale_secondary()
    # SERIALIZED: the secondary child runs to completion BEFORE this
    # process opens its own TPU client — two concurrent clients through
    # the axon tunnel either stall the newcomer's first compile for
    # 20+ minutes or kill it outright (observed r5), and the child's
    # host loops would contend with the parent's on the single core.
    secondary = _secondary_subprocess()

    det, cfg, trained = build_detector("dcn_local1", CKPT_LOCAL1)
    frames = synth_frames(24)
    legs = {}
    fps, live = _guarded_leg(
        "headline",
        lambda: timed_tracking(det, cfg, frames, iters=60), legs)
    print(f"headline: {fps:.2f} fps, {live:.1f} live tracks/frame, "
          f"trained={trained}", file=sys.stderr)
    cfps, clive = _guarded_leg(
        "chunk4",
        lambda: timed_tracking_chunked(det, cfg, frames, iters=20,
                                       chunk=4), legs)
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
    out.update(legs)
    if stale_note:
        out["stale_secondary_note"] = stale_note
    out.update(secondary)
    if "dcn_fps" in out:
        out["exact_dcn_fps"] = out.pop("dcn_fps")
        out["exact_dcn_vs_baseline"] = round(
            out["exact_dcn_fps"] / BASELINE_FPS, 3)
    if "nuscenes3d_fps" in out:
        # reference: 28 FPS nuScenes monocular 3D at 448x800
        # (/root/reference/README.md:47-51)
        out["nuscenes3d_vs_ref28"] = round(
            out["nuscenes3d_fps"] / 28.0, 3)
    if "pose_fps" in out:
        # reference: 33 ms/frame coco multi_pose dla_1x
        # (/root/reference/readme/MODEL_ZOO.md:72) = 30.3 fps
        out["pose_vs_ref30"] = round(out["pose_fps"] / 30.3, 3)
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
