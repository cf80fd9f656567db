"""Video/webcam/image-folder demo (reference: src/demo.py).

Usage:
  python -m centertrack_tpu.cli.demo tracking --demo video.mp4 \
      --load_model model.ckpt [--save_video --video_out out.mp4]

Engine modes: default = host Detector (reference-parity loop);
--fused = zero-host-sync FusedDetector (latency mode); --chunk F =
run_chunk (one lax.scan dispatch per F frames — throughput mode for
offline video; results lag up to 2F-1 frames).
"""

from __future__ import annotations

import json
import os
import sys

import cv2
import numpy as np

from centertrack_tpu.cli.opts import parse_demo
from centertrack_tpu.engine.detector import Detector

IMAGE_EXT = ["jpg", "jpeg", "png", "webp"]


class _FusedRunner:
    """Adapts FusedDetector to the demo loop's Detector.run contract;
    materializes results with one frame of lag so readback overlaps
    the next frame's compute. The returned dict carries the ABSOLUTE
    1-based index of the frame the results belong to ('frame', None
    while the pipeline is still filling); the last frame's results
    arrive via flush()."""

    def __init__(self, fused, cfg):
        self.fused = fused
        self.cfg = cfg
        self._pending = None
        self.emitted = 0  # frames whose results have been returned

    def run(self, img, meta=None):
        import time
        t0 = time.time()
        lazy = self.fused.run(img)
        prev = self._pending
        self._pending = lazy
        if prev is not None:
            self.emitted += 1
            results = self.fused.fetch_full(prev, self.cfg.out_thresh)
            frame = self.emitted
        else:
            results, frame = [], None
        return {"results": results, "frame": frame,
                "tot": time.time() - t0,
                "pre": 0.0, "net": time.time() - t0, "post": 0.0,
                "track": 0.0}

    def flush(self):
        """Drain the in-flight frame at end of stream; returns
        {absolute_frame_index: result_list}."""
        out = {}
        if self._pending is not None:
            self.emitted += 1
            out[self.emitted] = self.fused.fetch_full(
                self._pending, self.cfg.out_thresh)
            self._pending = None
        return out


class _ChunkRunner:
    """Adapts FusedDetector.run_chunk to the demo loop: buffers F
    frames, advances them all in ONE device dispatch (lax.scan over
    time), and hands results back per frame with up to 2F-1 frames of
    lag — the throughput serving mode for offline video (the per-frame
    --fused mode is the latency mode). Each returned result carries the
    ABSOLUTE 1-based index of the frame it belongs to ('frame', None
    while the pipeline is still filling), so the demo loop attributes
    lagged results to the right frame instead of the frame currently
    being captured."""

    def __init__(self, fused, cfg, chunk):
        self.fused = fused
        self.cfg = cfg
        self.chunk = int(chunk)
        self._buf = []
        self._ready = []
        self._pending = None
        self.emitted = 0  # frames whose results run() has returned

    def _dispatch(self):
        lazy = self.fused.run_chunk(np.stack(self._buf))
        self._buf = []
        if self._pending is not None:
            self._ready.extend(self.fused.fetch_chunk_full(
                self._pending, self.cfg.out_thresh))
        self._pending = lazy

    def run(self, img, meta=None):
        import time
        t0 = time.time()
        self._buf.append(img)
        if len(self._buf) == self.chunk:
            self._dispatch()
        if self._ready:
            results = self._ready.pop(0)
            self.emitted += 1
            frame = self.emitted
        else:
            results, frame = [], None
        dt = time.time() - t0
        return {"results": results, "frame": frame, "tot": dt,
                "pre": 0.0, "net": dt, "post": 0.0, "track": 0.0}

    def flush(self):
        """Drain buffered + in-flight frames at end of stream; returns
        {absolute_frame_index: result_list} for every not-yet-emitted
        frame."""
        if self._buf:
            self._dispatch()
        if self._pending is not None:
            self._ready.extend(self.fused.fetch_chunk_full(
                self._pending, self.cfg.out_thresh))
            self._pending = None
        out = {}
        for res in self._ready:
            self.emitted += 1
            out[self.emitted] = res
        self._ready = []
        return out


def _draw_results(img, results, vis_thresh=0.3):
    """Minimal overlay: boxes + ids + tracking arrows."""
    out = img.copy()
    for item in results:
        if item["score"] < vis_thresh:
            continue
        if item.get("active", 1) == 0:
            continue
        bbox = np.array(item["bbox"], np.int32)
        tid = item.get("tracking_id", 0)
        color = tuple(int(c) for c in (
            (tid * 67) % 255, (tid * 131) % 255, (tid * 37) % 255))
        cv2.rectangle(out, (bbox[0], bbox[1]), (bbox[2], bbox[3]), color, 2)
        cv2.putText(out, str(tid), (bbox[0], max(bbox[1] - 4, 0)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
        if "tracking" in item:
            ct = np.array(item["ct"], np.int32)
            tr = np.array(item["tracking"], np.int32)
            cv2.arrowedLine(out, tuple(ct), tuple(ct + tr), (0, 255, 255), 2)
    return out


def demo(cfg, args):
    chunk = int(getattr(args, "chunk", 0) or 0)
    if chunk > 1:
        from centertrack_tpu.engine.fused import FusedDetector
        detector = _ChunkRunner(FusedDetector(cfg), cfg, chunk)
    elif getattr(args, "fused", False):
        from centertrack_tpu.engine.fused import FusedDetector
        detector = _FusedRunner(FusedDetector(cfg), cfg)
    else:
        detector = Detector(cfg)
    results = {}

    is_video = False
    if args.demo == "webcam" or args.demo[args.demo.rfind(".") + 1:].lower() \
            in ["mp4", "mov", "avi", "mkv"]:
        is_video = True
        cam = cv2.VideoCapture(0 if args.demo == "webcam" else args.demo)
        frames = None
    else:
        if os.path.isdir(args.demo):
            frames = sorted(
                os.path.join(args.demo, f) for f in os.listdir(args.demo)
                if f.split(".")[-1].lower() in IMAGE_EXT)
        else:
            frames = [args.demo]

    writer = None
    cnt = 0
    timing = []
    while True:
        if is_video:
            ok, img = cam.read()
            if not ok or img is None:
                break
        else:
            if cnt >= len(frames):
                break
            img = cv2.imread(frames[cnt])
        cnt += 1
        ret = detector.run(img)
        # lagged engines (--fused/--chunk) report which frame the
        # results belong to; the host Detector's results are current
        frame_idx = ret.get("frame", cnt)
        if frame_idx is not None:
            results[frame_idx] = ret["results"]
        timing.append(ret["tot"])
        line = f"frame {cnt} |" + "".join(
            f" {k} {ret[k]:.3f}s" for k in
            ("tot", "pre", "net", "post", "track") if k in ret)
        print(line)
        if args.save_video:
            vis = _draw_results(img, ret["results"], cfg.vis_thresh)
            if writer is None:
                out_path = args.video_out or "demo_out.mp4"
                writer = cv2.VideoWriter(
                    out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                    args.save_framerate, (vis.shape[1], vis.shape[0]))
            writer.write(vis)
        if cfg.num_iters > 0 and cnt >= cfg.num_iters:
            break
    if hasattr(detector, "flush"):
        # lagged engines: trailing frames' results are still buffered /
        # in flight; flush() keys them by absolute frame index
        results.update(detector.flush())
    if writer is not None:
        writer.release()
    if args.save_results:
        path = f"demo_results_{cfg.task.replace(',', '_')}.json"
        with open(path, "w") as f:
            json.dump({k: [{kk: (vv.tolist()
                                 if isinstance(vv, np.ndarray) else vv)
                            for kk, vv in it.items()} for it in v]
                       for k, v in results.items()}, f)
        print(f"results saved to {path}")
    if len(timing) > 2:
        # skip warmup frames when reporting
        t = np.array(timing[2:])
        print(f"avg fps (excl. warmup): {1.0 / t.mean():.1f}")
    return results


def main():
    cfg, args = parse_demo()
    if args.demo == "":
        print("usage: demo.py <task> --demo <path>")
        sys.exit(1)
    demo(cfg, args)


if __name__ == "__main__":
    main()
