"""Demo CLI lagged engines (--chunk / --fused): buffered dispatch +
end-of-stream flush must yield a result list for EVERY frame AND
attribute each result to the frame it belongs to (reference demo loop:
src/demo.py:28-60, one result per frame). run_chunk is identical math
to per-frame run() calls, so the chunk-mode results dict must equal
the fused-mode one frame-by-frame — this catches lag misattribution
(results stored under the frame being captured instead of the frame
they belong to)."""

import types

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from centertrack_tpu.config import Config, parse_task, set_heads
from centertrack_tpu.cli.demo import demo


class TinyMeta:
    num_categories = 1
    default_resolution = [64, 96]
    num_joints = 17
    rest_focal_length = 1200
    flip_idx = []
    mean = np.array([0.40789654, 0.44719302, 0.47026115], np.float32)
    std = np.array([0.28863828, 0.27408164, 0.27809835], np.float32)


def _write_frames(tmp_path, n_frames):
    rng = np.random.RandomState(0)
    for i in range(n_frames):
        img = np.full((48, 80, 3), 120, np.uint8)
        x = 6 + 5 * i
        img[14:30, x:x + 12] = 250
        img += rng.randint(0, 8, img.shape).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f"f{i:03d}.png"), img)


def _cfg():
    cfg = Config(task="tracking", pre_hm=True, track_thresh=0.001,
                 new_thresh=0.001, out_thresh=0.001, max_age=3,
                 dla_node="conv", K=10, arch="generic",
                 backbone="tiny", neck="dlaup")
    cfg = parse_task(cfg)
    return set_heads(cfg, TinyMeta)


def test_demo_chunk_mode_matches_fused_per_frame(tmp_path, monkeypatch):
    # 13 frames with chunk=3 reaches the steady-state pop regime
    # (needs >= 4*chunk-2 = 10) AND exercises the flush path (13 is
    # not a multiple of 3)
    n_frames = 13
    _write_frames(tmp_path, n_frames)
    cfg = _cfg()
    # demo() builds FusedDetector(cfg) without a dataset_meta override;
    # point the registry default at the tiny meta
    monkeypatch.setattr(
        "centertrack_tpu.data.registry.get_dataset_meta",
        lambda name, c: TinyMeta)

    base = dict(demo=str(tmp_path), save_video=False, save_results=False,
                video_out="", save_framerate=30)
    res_chunk = demo(cfg, types.SimpleNamespace(
        **base, fused=False, chunk=3))
    res_fused = demo(cfg, types.SimpleNamespace(
        **base, fused=True, chunk=0))

    keys = list(range(1, n_frames + 1))
    assert sorted(res_chunk.keys()) == keys
    assert sorted(res_fused.keys()) == keys
    # random weights detect *something* everywhere at thresh 0.001
    assert any(len(v) > 0 for v in res_chunk.values())
    # per-frame equality: same detections, same ids, same boxes —
    # both engines share the same deterministic init (cfg.seed)
    for f in keys:
        a, b = res_chunk[f], res_fused[f]
        assert len(a) == len(b), f"frame {f}: {len(a)} vs {len(b)} dets"
        for ia, ib in zip(a, b):
            assert ia["tracking_id"] == ib["tracking_id"]
            assert ia["class"] == ib["class"]
            np.testing.assert_allclose(ia["bbox"], ib["bbox"],
                                       rtol=1e-4, atol=1e-3)
            np.testing.assert_allclose(ia["score"], ib["score"],
                                       rtol=1e-4, atol=1e-4)
        for item in a:
            assert "bbox" in item and "tracking_id" in item
