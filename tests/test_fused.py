"""FusedDetector must track a synthetic moving object consistently and
agree structurally with the host Detector pipeline."""

import numpy as np
import pytest

from centertrack_tpu.config import Config, parse_task, set_heads
from centertrack_tpu.engine.fused import FusedDetector


class TinyMeta:
    num_categories = 1
    default_resolution = [64, 96]
    num_joints = 17
    rest_focal_length = 1200
    flip_idx = []
    mean = np.array([0.40789654, 0.44719302, 0.47026115], np.float32)
    std = np.array([0.28863828, 0.27408164, 0.27809835], np.float32)


def test_fused_pipeline_runs():
    cfg = Config(task="tracking", pre_hm=True, track_thresh=0.001,
                 new_thresh=0.001, max_age=3, dla_node="conv", K=10,
                 arch="generic", backbone="tiny", neck="dlaup")
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, TinyMeta)
    det = FusedDetector(cfg, dataset_meta=TinyMeta)
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (48, 80, 3), np.uint8)
              for _ in range(3)]
    lazy = [det.run(f) for f in frames]
    results = [FusedDetector.fetch(l, cfg.out_thresh) for l in lazy]
    # frame 1 has no tracks yet (init frame seeds from its own dets);
    # subsequent frames must carry ids
    assert len(results[1]) > 0
    for item in results[1]:
        assert item["tracking_id"] >= 1
        assert item["bbox"].shape == (4,)
        # image coordinates within the raw 80x48 frame's warp range
        assert -100 < item["ct"][0] < 200
    ids1 = {r["tracking_id"] for r in results[1]}
    ids2 = {r["tracking_id"] for r in results[2]}
    assert ids1 and ids2
    det.reset_tracking()
    assert int(np.asarray(det.track_state.valid).sum()) == 0


def test_run_chunk_matches_per_frame():
    """run_chunk (one lax.scan dispatch over F frames) must produce the
    same per-frame results as F run() calls — same warp, pre_hm,
    decode, and association math, only the dispatch granularity
    differs."""
    cfg = Config(task="tracking", pre_hm=True, track_thresh=0.001,
                 new_thresh=0.001, max_age=3, dla_node="conv", K=10,
                 arch="generic", backbone="tiny", neck="dlaup")
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, TinyMeta)
    det_a = FusedDetector(cfg, dataset_meta=TinyMeta)
    det_b = FusedDetector(cfg, params=det_a.params,
                          batch_stats=det_a.batch_stats,
                          dataset_meta=TinyMeta)
    rng = np.random.RandomState(1)
    frames = [rng.randint(0, 255, (48, 80, 3), np.uint8)
              for _ in range(4)]
    per_frame = [FusedDetector.fetch(det_a.run(f), cfg.out_thresh)
                 for f in frames]
    chunked = FusedDetector.fetch_chunk(
        det_b.run_chunk(np.stack(frames)), cfg.out_thresh)
    assert len(chunked) == len(frames)
    for fi, (a, b) in enumerate(zip(per_frame, chunked)):
        assert len(a) == len(b), f"frame {fi}: {len(a)} vs {len(b)}"
        for da, db in zip(a, b):
            assert da["tracking_id"] == db["tracking_id"]
            assert da["class"] == db["class"]
            np.testing.assert_allclose(da["score"], db["score"],
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(da["bbox"], db["bbox"],
                                       rtol=1e-4, atol=1e-3)
    # chunked state continues seamlessly into per-frame mode
    more = FusedDetector.fetch(det_b.run(frames[-1]), cfg.out_thresh)
    for d in more:
        assert d["tracking_id"] >= 1
