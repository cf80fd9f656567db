"""End-to-end decode coverage for the extension tasks: multi_pose
(keypoints + hm_hp snap) and ddd (depth/rot/dim + 3D unprojection)."""

import numpy as np
import pytest

from centertrack_tpu.config import Config, parse_task, set_heads
from centertrack_tpu.engine.detector import Detector


class PoseMeta:
    num_categories = 1
    default_resolution = [64, 96]
    num_joints = 17
    rest_focal_length = 1200
    flip_idx = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10],
                [11, 12], [13, 14], [15, 16]]
    mean = np.array([0.40789654, 0.44719302, 0.47026115], np.float32)
    std = np.array([0.28863828, 0.27408164, 0.27809835], np.float32)


class DddMeta(PoseMeta):
    num_categories = 3


def test_multi_pose_tracking_e2e():
    cfg = Config(task="tracking,multi_pose", pre_hm=True,
                 track_thresh=0.001, new_thresh=0.001, dla_node="conv",
                 K=8)
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, PoseMeta)
    assert "hps" in cfg.heads_dict and "hm_hp" in cfg.heads_dict \
        and "hp_offset" in cfg.heads_dict
    det = Detector(cfg, dataset_meta=PoseMeta)
    frame = np.random.RandomState(0).randint(
        0, 255, (48, 80, 3), np.uint8)
    ret = det.run(frame)
    assert len(ret["results"]) > 0
    item = ret["results"][0]
    assert "hps" in item and len(item["hps"]) == 34
    assert "tracking_id" in item


def test_ddd_tracking_e2e():
    cfg = Config(task="tracking,ddd", pre_hm=True, track_thresh=0.001,
                 new_thresh=0.001, dla_node="conv", K=8)
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, DddMeta)
    for h in ("dep", "rot", "dim", "amodel_offset"):
        assert h in cfg.heads_dict
    det = Detector(cfg, dataset_meta=DddMeta)
    frame = np.random.RandomState(1).randint(
        0, 255, (48, 80, 3), np.uint8)
    ret = det.run(frame)
    assert len(ret["results"]) > 0
    item = ret["results"][0]
    # 3D outputs: alpha from 8-bin rot, unprojected location + yaw
    assert "alpha" in item and "loc" in item and "rot_y" in item
    assert "dim" in item and len(item["dim"]) == 3
    assert np.isfinite(item["loc"]).all()
    assert -np.pi - 1e-3 <= item["rot_y"] <= np.pi + 1e-3


def test_flip_test_path():
    cfg = Config(task="ctdet", flip_test=True, dla_node="conv", K=8,
                 out_thresh=0.001, track_thresh=0.001)
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, PoseMeta)
    det = Detector(cfg, dataset_meta=PoseMeta)
    frame = np.random.RandomState(2).randint(
        0, 255, (48, 80, 3), np.uint8)
    ret = det.run(frame)
    assert len(ret["results"]) > 0
