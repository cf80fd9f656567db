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


def _build_task_detector(task, node="conv"):
    cfg = Config(task=task, pre_hm=True, track_thresh=0.001,
                 new_thresh=0.001, max_age=3, dla_node=node, K=10,
                 arch="generic", backbone="tiny", neck="dlaup")
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, TinyMeta)
    return FusedDetector(cfg, dataset_meta=TinyMeta), cfg


def test_fused_ddd_lift_matches_host_math():
    """tracking,ddd: the on-device 3D lift (alpha from the 8-bin rot
    head, amodal center, unprojection to loc/rot_y) must reproduce the
    host post-process math (engine/post_process.py:86-99 /
    utils/ddd.ddd2locrot_batch; reference: post_process.py:65-77)."""
    from centertrack_tpu.utils.ddd import ddd2locrot_batch

    det, cfg = _build_task_detector("tracking,ddd")
    assert [n for n, _ in det._extras] == [
        "dep", "alpha", "dim", "loc", "rot_y", "amodel_ct"]
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 255, (48, 80, 3), np.uint8)
              for _ in range(3)]
    lazy = [det.run(f) for f in frames]
    results = [det.fetch_full(l, cfg.out_thresh) for l in lazy]
    assert len(results[1]) > 0
    h, w = frames[0].shape[:2]
    f = TinyMeta.rest_focal_length
    calib = np.array([[f, 0, w / 2, 0], [0, f, h / 2, 0],
                      [0, 0, 1, 0]], np.float32)
    for item in results[1]:
        assert item["dim"].shape == (3,)
        assert item["loc"].shape == (3,)
        assert np.isfinite(item["dep"])
        assert -np.pi <= item["rot_y"] <= np.pi
        # 'ct' is the amodal center for ddd (dict contract parity)
        locs, rot_ys = ddd2locrot_batch(
            item["ct"][None], np.array([item["alpha"]]),
            item["dim"][None], np.array([item["dep"]]), calib)
        np.testing.assert_allclose(item["loc"], locs[0],
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(item["rot_y"], rot_ys[0],
                                   rtol=1e-3, atol=1e-3)
    # base fetch() still parses the layout-stable 2D prefix
    base = FusedDetector.fetch(lazy[1], cfg.out_thresh)
    assert len(base) == len(results[1])
    for b, r in zip(base, results[1]):
        assert b["tracking_id"] == r["tracking_id"]
        np.testing.assert_allclose(b["bbox"], r["bbox"])


def test_fused_pose_packs_keypoints():
    """tracking,multi_pose: hm_hp-snapped keypoints arrive in image
    coordinates through the same packed transfer."""
    det, cfg = _build_task_detector("tracking,multi_pose")
    names = [n for n, _ in det._extras]
    assert names == ["hps", "kps_score"]
    assert dict(det._extras)["hps"] == 2 * TinyMeta.num_joints
    rng = np.random.RandomState(4)
    frames = [rng.randint(0, 255, (48, 80, 3), np.uint8)
              for _ in range(3)]
    results = [det.fetch_full(det.run(f), cfg.out_thresh)
               for f in frames]
    assert len(results[1]) > 0
    for item in results[1]:
        assert item["hps"].shape == (2 * TinyMeta.num_joints,)
        # keypoints land in (warped) image coordinate range
        assert np.all(np.abs(item["hps"]) < 500)
        assert np.isfinite(item["kps_score"])


def test_multistream_ddd_extras():
    """MultiStreamDetector packs the same per-task extras per stream."""
    from centertrack_tpu.engine.fused import MultiStreamDetector
    cfg = Config(task="tracking,ddd", pre_hm=True, track_thresh=0.001,
                 new_thresh=0.001, max_age=3, dla_node="conv", K=10,
                 arch="generic", backbone="tiny", neck="dlaup")
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, TinyMeta)
    det = MultiStreamDetector(cfg, 2, dataset_meta=TinyMeta)
    rng = np.random.RandomState(5)
    stk = [rng.randint(0, 255, (2, 48, 80, 3), np.uint8)
           for _ in range(3)]
    for s in stk[:-1]:
        lazy = det.run(s)
    res = det.fetch_all_full(lazy, cfg.out_thresh)
    assert len(res) == 2
    assert any(len(r) > 0 for r in res)
    for stream in res:
        for item in stream:
            assert "loc" in item and "rot_y" in item and "dep" in item
