"""NuScenes dataset end-to-end eval plumbing: convert_eval_format ->
submission json -> hermetic metrics. GT-derived predictions must score
perfectly (reference: src/lib/dataset/datasets/nuscenes.py:202-221)."""

import json
import os

import numpy as np
import pytest

from centertrack_tpu.config import Config, parse_task, set_heads
from centertrack_tpu.data.generic import GenericDataset
from centertrack_tpu.data.nuscenes import NuScenes


class FixtureNuScenes(NuScenes):
    def __init__(self, cfg, split, ann_path, img_dir):
        GenericDataset.__init__(self, cfg, split, ann_path, img_dir)
        self.alpha_in_degree = False


def _identity_info(image_id, video_id, frame_id, token):
    return {
        "id": image_id, "file_name": f"img{image_id}.jpg",
        "width": 800, "height": 448,
        "video_id": video_id, "frame_id": frame_id,
        "sample_token": token, "sensor_id": 1,
        "trans_matrix": np.eye(4).tolist(),
        "pose_record_rot": [1, 0, 0, 0],
        "cs_record_rot": [1, 0, 0, 0],
        "calib": [[1200, 0, 400, 0], [0, 1200, 224, 0], [0, 0, 1, 0]],
    }


@pytest.fixture(scope="module")
def nusc_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc")
    images, anns, aid = [], [], 1
    # one scene, 3 samples, 2 cars tracked through all frames
    for f in range(3):
        image_id = f + 1
        images.append(_identity_info(image_id, 1, f, f"tok{f}"))
        for k in range(2):
            loc = [2.0 * f + 0.5, 1.0, 8.0 + 10.0 * k]  # camera frame
            dim = [1.5, 1.9, 4.2]  # h, w, l
            anns.append({
                "id": aid, "image_id": image_id, "category_id": 1,
                "bbox": [100 + 50 * k, 100, 40, 40], "area": 1600,
                "iscrowd": 0, "track_id": k + 1,
                "location": loc, "dim": dim, "rotation_y": 0.3 * k,
                "depth": loc[2], "amodel_center": [400, 224],
                "occluded": 0, "truncated": 0,
                # 6 = vehicle.moving: what zero attribute logits decode
                # to, so GT-copied predictions stay attribute-perfect
                "attributes": 6, "velocity": [0, 0, 0],
            })
            aid += 1
    data = {
        "images": images, "annotations": anns,
        "categories": [{"id": i + 1, "name": n} for i, n in
                       enumerate(NuScenes.class_name)],
        "videos": [{"id": 1, "file_name": "scene0"}],
    }
    ann_path = os.path.join(str(root), "nusc_mini.json")
    with open(ann_path, "w") as fh:
        json.dump(data, fh)
    return ann_path, str(root)


def _make_cfg(tracking):
    task = "tracking,ddd" if tracking else "ddd"
    cfg = Config(task=task, dataset="nuscenes", pre_hm=tracking)
    cfg = parse_task(cfg)
    return set_heads(cfg, NuScenes)


def _gt_results(ds):
    """Predictions copied from the GT annotations."""
    results = {}
    for image_id in ds.images:
        items = []
        for ann in ds.coco.loadAnns(ds.coco.getAnnIds(imgIds=[image_id])):
            items.append({
                "class": ann["category_id"], "score": 0.9,
                "loc": list(ann["location"]), "dim": list(ann["dim"]),
                "rot_y": ann["rotation_y"],
                "tracking_id": ann["track_id"],
            })
        results[image_id] = items
    return results


def test_run_eval_detection_gt_perfect(nusc_fixture, tmp_path):
    ann_path, img_dir = nusc_fixture
    cfg = _make_cfg(tracking=False)
    ds = FixtureNuScenes(cfg, "val", ann_path, img_dir)
    metrics = ds.run_eval(_gt_results(ds), str(tmp_path))
    np.testing.assert_allclose(metrics["mean_ap"], 1.0)
    assert metrics["nds"] > 0.99
    assert os.path.exists(
        os.path.join(str(tmp_path), "metrics_nuscenes_det.json"))


def test_run_eval_tracking_gt_perfect(nusc_fixture, tmp_path):
    ann_path, img_dir = nusc_fixture
    cfg = _make_cfg(tracking=True)
    ds = FixtureNuScenes(cfg, "val", ann_path, img_dir)
    metrics = ds.run_eval(_gt_results(ds), str(tmp_path))
    np.testing.assert_allclose(metrics["amota"], 1.0)
    assert metrics["amotp"] < 1e-6


def test_run_eval_tracking_degrades_with_noise(nusc_fixture, tmp_path):
    ann_path, img_dir = nusc_fixture
    cfg = _make_cfg(tracking=True)
    ds = FixtureNuScenes(cfg, "val", ann_path, img_dir)
    results = _gt_results(ds)
    # drop one car everywhere + flip an id on the other mid-scene
    for i, (image_id, items) in enumerate(sorted(results.items())):
        kept = [it for it in items if it["tracking_id"] == 1]
        if i == 2:
            kept[0]["tracking_id"] = 5
        results[image_id] = kept
    metrics = ds.run_eval(results, str(tmp_path))
    assert metrics["amota"] < 0.6
