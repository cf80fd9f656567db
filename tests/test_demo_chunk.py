"""Demo CLI chunk mode: buffered run_chunk dispatch + end-of-stream
flush must yield a result list for EVERY frame (reference demo loop:
src/demo.py:28-60, one result per frame)."""

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


def test_demo_chunk_mode_covers_every_frame(tmp_path, monkeypatch):
    rng = np.random.RandomState(0)
    n_frames = 7  # NOT a multiple of chunk: exercises the flush path
    for i in range(n_frames):
        img = np.full((48, 80, 3), 120, np.uint8)
        x = 6 + 7 * i
        img[14:30, x:x + 12] = 250
        img += rng.randint(0, 8, img.shape).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f"f{i:03d}.png"), img)

    cfg = Config(task="tracking", pre_hm=True, track_thresh=0.001,
                 new_thresh=0.001, out_thresh=0.001, max_age=3,
                 dla_node="conv", K=10, arch="generic",
                 backbone="tiny", neck="dlaup")
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, TinyMeta)
    # demo() builds FusedDetector(cfg) without a dataset_meta override;
    # point the registry default at the tiny meta
    monkeypatch.setattr(
        "centertrack_tpu.data.registry.get_dataset_meta",
        lambda name, c: TinyMeta)

    args = types.SimpleNamespace(
        demo=str(tmp_path), save_video=False, save_results=False,
        video_out="", save_framerate=30, fused=False, chunk=3)
    results = demo(cfg, args)
    assert sorted(results.keys()) == list(range(1, n_frames + 1))
    # random weights detect *something* everywhere at thresh 0.001
    assert all(isinstance(v, list) for v in results.values())
    assert any(len(v) > 0 for v in results.values())
    for v in results.values():
        for item in v:
            assert "bbox" in item and "tracking_id" in item
