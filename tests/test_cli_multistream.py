"""cli/test.py --multi_stream N: scheduler correctness.

Checks the video->stream scheduler (queue rotation, per-stream resets,
tail padding, lag draining, result mapping) by comparing multi-stream
eval results against sequentially tracking each video with a
FusedDetector (identical device-tracker semantics, same seeded
weights). Reference throughput mode being covered: src/test.py:53-130.
"""

import json
import os
import types

import numpy as np
import pytest


def _make_cfg(ann_path, img_dir):
    from centertrack_tpu.config import Config, parse_task, set_heads

    cfg = Config(task="tracking", dataset="custom", pre_hm=True,
                 custom_dataset_ann_path=ann_path,
                 custom_dataset_img_path=img_dir,
                 num_classes=1, input_h=96, input_w=160,
                 arch="generic", backbone="tiny", neck="dlaup",
                 dla_node="conv", K=10, seed=3,
                 track_thresh=0.001, new_thresh=0.001, out_thresh=0.001,
                 max_age=3)
    cfg = parse_task(cfg)
    return set_heads(cfg, type("M", (), {
        "num_categories": 1, "default_resolution": (96, 160),
        "num_joints": 17}))


def test_group_videos(tmp_path):
    """Video splitting (frame_id==1 boundaries) + resolution buckets."""
    from centertrack_tpu.tools.selftest import make_dataset
    from centertrack_tpu.cli.test import _group_videos
    from centertrack_tpu.data.datasets import CustomDataset

    root = str(tmp_path / "ds")
    ann_path, img_dir = make_dataset(root, num_videos=3, frames=4,
                                     width=160, height=96)
    cfg = _make_cfg(ann_path, img_dir)
    ds = CustomDataset(cfg, "val")
    by_res = _group_videos(cfg, ds)
    assert list(by_res) == [(96, 160)]
    vids = by_res[(96, 160)]
    assert [len(v) for v in vids] == [4, 4, 4]
    # ordered frames within each video, disjoint ids across videos
    ids = [[f[0] for f in v] for v in vids]
    assert all(sorted(i) == i for i in ids)
    assert len({x for i in ids for x in i}) == 12


@pytest.mark.slow
def test_multistream_eval_matches_sequential(tmp_path, monkeypatch):
    from centertrack_tpu.tools.selftest import make_dataset
    from centertrack_tpu.cli.test import test_multistream
    from centertrack_tpu.data.datasets import CustomDataset
    from centertrack_tpu.engine.fused import FusedDetector
    import cv2

    root = str(tmp_path / "ds")
    # 3 videos through 2 streams: one stream tracks two videos in
    # sequence (exercises the mid-run reset + queue rotation) and the
    # other pads the tail with discarded frames
    ann_path, img_dir = make_dataset(root, num_videos=3, frames=5,
                                     width=160, height=96)
    cfg = _make_cfg(ann_path, img_dir)

    monkeypatch.chdir(tmp_path)
    args = types.SimpleNamespace(load_results="", save_results=True)
    test_multistream(cfg, args, 2)
    out = tmp_path / "exp" / "tracking" / cfg.exp_id / \
        "save_results_custom.json"
    with open(out) as f:
        ms_results = {int(k): v for k, v in json.load(f).items()}

    # sequential reference: FusedDetector per video, reset at video
    # boundaries — semantics test_multistream must reproduce
    ds = CustomDataset(cfg, "val")
    det = FusedDetector(cfg, dataset_meta=type(ds))
    seq_results = {}
    for ind in range(len(ds)):
        img_id = ds.images[ind]
        info = ds.coco.loadImgs([img_id])[0]
        if info.get("frame_id", 1) == 1:
            det.reset_tracking()
        frame = cv2.imread(os.path.join(ds.img_dir, info["file_name"]))
        lazy = det.run(frame)
        seq_results[img_id] = det.fetch(lazy, cfg.out_thresh)

    assert set(ms_results) == set(seq_results)
    for img_id in seq_results:
        a, b = ms_results[img_id], seq_results[img_id]
        assert len(a) == len(b), f"img {img_id}: {len(a)} vs {len(b)}"
        for da, db in zip(a, b):
            assert da["tracking_id"] == db["tracking_id"]
            assert da["class"] == db["class"]
            np.testing.assert_allclose(da["score"], db["score"],
                                       rtol=2e-2, atol=2e-3)
            np.testing.assert_allclose(da["bbox"], db["bbox"],
                                       rtol=2e-2, atol=0.6)
