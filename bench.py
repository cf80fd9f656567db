"""Benchmark: DLA-34 tracking FPS at MOT17 resolution (544x960) on one
TPU chip — the reference's headline speed metric (22 FPS on TITAN Xp,
README.md:36-39; 45 ms/frame, MODEL_ZOO.md:16).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Measures the full per-frame pipeline through Detector.run (uint8 frame
upload, on-device warp+pre_hm render+forward+decode, host post-process +
association), steady state, excluding compile warmup.
"""

import json
import sys
import time

import numpy as np

BASELINE_FPS = 22.0  # reference MOT17 tracking FPS on TITAN Xp


def main():
    from centertrack_tpu.config import Config, parse_task, set_heads
    from centertrack_tpu.engine.detector import Detector

    class MOTMeta:
        num_categories = 1
        default_resolution = [544, 960]
        num_joints = 17
        rest_focal_length = 1200
        flip_idx = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10],
                    [11, 12], [13, 14], [15, 16]]
        mean = np.array([0.40789654, 0.44719302, 0.47026115], np.float32)
        std = np.array([0.28863828, 0.27408164, 0.27809835], np.float32)

    cfg = Config(task="tracking", pre_hm=True, track_thresh=0.01,
                 new_thresh=0.01, max_age=3)
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, MOTMeta)
    det = Detector(cfg, dataset_meta=MOTMeta)

    rng = np.random.RandomState(0)
    # synthetic 1080p-ish frames (MOT17 videos are 1920x1080)
    frames = [rng.randint(0, 255, (1080, 1920, 3), np.uint8)
              for _ in range(4)]

    warmup, iters = 3, 30
    for i in range(warmup):
        det.run(frames[i % len(frames)])
    t0 = time.time()
    for i in range(iters):
        det.run(frames[i % len(frames)])
    dt = (time.time() - t0) / iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "MOT17_tracking_FPS_dla34_544x960_1chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
