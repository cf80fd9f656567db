"""nuScenes<->KITTI converter round-trip on synthetic DB tables
(reference: src/tools/nuScenes_lib/export_kitti.py)."""

import json
import os

import numpy as np
import pytest

from centertrack_tpu.data.nuscenes import Quat
from centertrack_tpu.tools.nuscenes_kitti import (
    KITTI_TO_NU_LIDAR, NuScenesKittiConverter, kitti_res_to_nuscenes,
    parse_label_line, quat_of_matrix, rot_of)


def _yaw_quat(angle):
    return Quat(axis=[0, 0, 1], angle=angle).q.tolist()


@pytest.fixture(scope="module")
def mini_tables(tmp_path_factory):
    """Two samples, two annotated cars + one ignored category."""
    root = tmp_path_factory.mktemp("nusc_kitti")
    version = "v1.0-test"
    d = os.path.join(str(root), version)
    os.makedirs(d)

    # camera looks along +x of ego (its z axis forward): standard
    # nuScenes CAM_FRONT rotation ego->cam approximately
    cam_rot = (Quat(axis=[0, 0, 1], angle=-np.pi / 2) *
               Quat(axis=[1, 0, 0], angle=-np.pi / 2)).q.tolist()
    tables = {
        "sensor": [
            {"token": "se_cam", "channel": "CAM_FRONT", "modality":
             "camera"},
            {"token": "se_lid", "channel": "LIDAR_TOP", "modality":
             "lidar"},
        ],
        "calibrated_sensor": [
            {"token": "cs_cam", "sensor_token": "se_cam",
             "translation": [1.7, 0.0, 1.5], "rotation": cam_rot,
             "camera_intrinsic": [[1266.0, 0.0, 800.0],
                                  [0.0, 1266.0, 450.0],
                                  [0.0, 0.0, 1.0]]},
            {"token": "cs_lid", "sensor_token": "se_lid",
             "translation": [0.9, 0.0, 1.8],
             "rotation": _yaw_quat(-np.pi / 2)},  # nu lidar: x right
        ],
        "ego_pose": [
            {"token": "ep1", "translation": [100.0, 50.0, 0.0],
             "rotation": _yaw_quat(0.3), "timestamp": 1},
            {"token": "ep2", "translation": [102.0, 50.5, 0.0],
             "rotation": _yaw_quat(0.35), "timestamp": 2},
        ],
        "scene": [
            {"token": "sc1", "name": "scene-0001",
             "first_sample_token": "s1", "log_token": "lg1"},
        ],
        "sample": [
            {"token": "s1", "scene_token": "sc1", "timestamp": 1,
             "prev": "", "next": "s2"},
            {"token": "s2", "scene_token": "sc1", "timestamp": 2,
             "prev": "s1", "next": ""},
        ],
        "sample_data": [],
        "sample_annotation": [],
        "instance": [
            {"token": "in1", "category_token": "cat_car"},
            {"token": "in2", "category_token": "cat_car"},
            {"token": "in3", "category_token": "cat_debris"},
        ],
        "category": [
            {"token": "cat_car", "name": "vehicle.car"},
            {"token": "cat_debris", "name": "movable_object.debris"},
        ],
        "attribute": [],
    }
    for i, (s, ep) in enumerate([("s1", "ep1"), ("s2", "ep2")]):
        for cs, chan, ext in [("cs_cam", "CAM", "jpg"),
                              ("cs_lid", "LID", "pcd.bin")]:
            tables["sample_data"].append({
                "token": f"sd_{chan}_{s}", "sample_token": s,
                "calibrated_sensor_token": cs, "ego_pose_token": ep,
                "is_key_frame": True, "timestamp": i + 1,
                "filename": f"sweeps/{chan}/{s}.{ext}",
            })
    # cars ~15 m ahead of the ego (global frame), axis-aligned-ish
    aid = 0
    for s, ep_yaw, ep_t in [("s1", 0.3, [100.0, 50.0, 0.0]),
                            ("s2", 0.35, [102.0, 50.5, 0.0])]:
        fwd = np.array([np.cos(ep_yaw), np.sin(ep_yaw), 0.0])
        left = np.array([-np.sin(ep_yaw), np.cos(ep_yaw), 0.0])
        for k, inst in [(0, "in1"), (1, "in2")]:
            center = (np.asarray(ep_t) + fwd * (15 + 5 * k)
                      + left * (2.0 * k - 1.0) + np.array([0, 0, 0.9]))
            tables["sample_annotation"].append({
                "token": f"a{aid}", "sample_token": s,
                "instance_token": inst,
                "translation": center.tolist(),
                "size": [1.9, 4.5, 1.6],  # w, l, h
                "rotation": _yaw_quat(ep_yaw + 0.1 * k),
                "prev": "", "next": "", "num_lidar_pts": 10,
                "visibility_token": "4", "attribute_tokens": [],
            })
            aid += 1
        # one ignored-category object
        tables["sample_annotation"].append({
            "token": f"a{aid}", "sample_token": s,
            "instance_token": "in3",
            "translation": [110.0, 55.0, 0.5], "size": [1, 1, 1],
            "rotation": _yaw_quat(0.0), "prev": "", "next": "",
            "num_lidar_pts": 1, "visibility_token": "4",
            "attribute_tokens": [],
        })
        aid += 1
    for name, rows in tables.items():
        with open(os.path.join(d, f"{name}.json"), "w") as f:
            json.dump(rows, f)
    # lidar pointclouds (5 floats/pt)
    for s in ("s1", "s2"):
        p = os.path.join(str(root), "sweeps", "LID")
        os.makedirs(p, exist_ok=True)
        pts = np.arange(25, dtype=np.float32).reshape(5, 5)
        pts.tofile(os.path.join(p, f"{s}.pcd.bin"))
    return str(root), version


def test_gt_to_kitti_files(mini_tables, tmp_path):
    root, version = mini_tables
    conv = NuScenesKittiConverter(root, version, image_count=0)
    out = str(tmp_path / "kitti")
    toks = conv.nuscenes_gt_to_kitti(out, split="train",
                                     copy_images=False)
    assert toks == ["s1", "s2"]
    for tok in toks:
        label = os.path.join(out, "train", "label_2", f"{tok}.txt")
        calib = os.path.join(out, "train", "calib", f"{tok}.txt")
        assert os.path.exists(label) and os.path.exists(calib)
        lines = [l for l in open(label).read().splitlines() if l]
        assert len(lines) == 2  # debris category skipped
        for line in lines:
            p = parse_label_line(line)
            assert p["name"] == "car"
            # in front of the camera, plausible depth
            assert 5 < p["xyz_camera"][2] < 40
            x0, y0, x1, y1 = p["bbox_camera"]
            assert 0 <= x0 < x1 <= 1600 and 0 <= y0 < y1 <= 900
        # calib sanity: KITTI-style velo_to_cam rotation
        from centertrack_tpu.tools.nuscenes_kitti import read_calib
        c = read_calib(calib)
        want = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
        np.testing.assert_allclose(np.round(c["velo_to_cam_R"]), want,
                                   atol=1e-6)
    # lidar bin written with 4 floats/pt
    v = np.fromfile(os.path.join(out, "train", "velodyne", "s1.bin"),
                    np.float32).reshape(-1, 4)
    assert v.shape[0] == 5


def test_round_trip_to_nuscenes(mini_tables, tmp_path):
    root, version = mini_tables
    conv = NuScenesKittiConverter(root, version, image_count=0)
    out = str(tmp_path / "kitti")
    conv.nuscenes_gt_to_kitti(out, split="train", copy_images=False,
                              convert_lidar=False)
    sub = kitti_res_to_nuscenes(out, "train",
                                str(tmp_path / "submission.json"))
    assert set(sub["results"].keys()) == {"s1", "s2"}
    # recover the ORIGINAL nu-lidar-frame boxes and compare
    for tok in ("s1", "s2"):
        sd_lid = conv.sd_of[(tok, "LIDAR_TOP")]
        cs_lid = conv.t.calibrated_sensor[
            sd_lid["calibrated_sensor_token"]]
        want = conv._boxes_in_nu_lidar(tok, sd_lid, cs_lid)
        got = sub["results"][tok]
        assert len(got) == len(want) == 2
        # match by nearest center
        for g in got:
            dists = [np.linalg.norm(np.array(g["translation"])
                                    - wbox["center"]) for wbox in want]
            i = int(np.argmin(dists))
            # label files round to 2 decimals -> cm-level agreement
            assert dists[i] < 0.05
            np.testing.assert_allclose(g["size"], want[i]["wlh"],
                                       atol=0.01)
            r_want = want[i]["rot"]
            r_got = rot_of(g["rotation"])
            # orientations agree up to label yaw rounding
            x_want = r_want @ np.array([1.0, 0, 0])
            x_got = r_got @ np.array([1.0, 0, 0])
            assert float(x_want @ x_got) > 0.999
            assert g["detection_name"] == "car"


def test_quat_of_matrix_round_trip():
    rng = np.random.RandomState(0)
    for _ in range(20):
        axis = rng.randn(3)
        q = Quat(axis=axis, angle=float(rng.uniform(-3, 3)))
        r = rot_of(q.q)
        q2 = quat_of_matrix(r)
        r2 = rot_of(q2)
        np.testing.assert_allclose(r2, r, atol=1e-10)
