"""nuScenes <-> KITTI format converter, devkit-free
(reference: src/tools/nuScenes_lib/export_kitti.py and
src/tools/nuScenes_lib/utils_kitti.py, which drive nuscenes-devkit +
pyquaternion; this implementation reads the raw v1.0 DB tables via
`Tables` and does all frame changes with plain rotation matrices).

Two directions:
  * ``nuscenes_gt_to_kitti`` — export CAM_FRONT samples as a KITTI-style
    dataset: ``image_2/*.png``, ``velodyne/*.bin``, ``calib/*.txt``
    (P2 + R0_rect=I + Tr_velo_to_cam) and ``label_2/*.txt`` 3D labels in
    the rectified-camera frame (reference: export_kitti.py:83-243).
  * ``kitti_res_to_nuscenes`` — parse KITTI label/result files back into
    the nuScenes detection submission format, boxes in the nuScenes
    LIDAR frame exactly as the reference does
    (reference: export_kitti.py:271-340, utils_kitti.py:268-345).

Frame conventions (utils_kitti.py:24-38): KITTI lidar x-forward vs
nuScenes lidar x-right differ by a +90 deg yaw; KITTI boxes live in the
rectified camera frame with the center at the BOTTOM face; KITTI yaw is
measured around -y of the camera.

Usage:
  python -m centertrack_tpu.tools.nuscenes_kitti gt_to_kitti \
      --data_path data/nuscenes --version v1.0-mini --out_dir out \
      [--split mini_train] [--image_count 10]
  python -m centertrack_tpu.tools.nuscenes_kitti res_to_nuscenes \
      --kitti_dir out --split mini_train --out submission.json
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from centertrack_tpu.data.nuscenes import Quat

# +90 deg yaw: KITTI lidar (x fwd) -> nuScenes lidar (x right)
KITTI_TO_NU_LIDAR = np.array([[0.0, -1.0, 0.0],
                              [1.0, 0.0, 0.0],
                              [0.0, 0.0, 1.0]])
IMSIZE = (1600, 900)  # nuScenes camera (width, height)


def rot_of(wxyz) -> np.ndarray:
    """3x3 rotation matrix of a wxyz quaternion."""
    return Quat(wxyz).rotate(np.eye(3))


def quat_of_matrix(r: np.ndarray) -> np.ndarray:
    """wxyz quaternion of a rotation matrix (Shepperd's method)."""
    t = np.trace(r)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        q = [0.25 * s, (r[2, 1] - r[1, 2]) / s,
             (r[0, 2] - r[2, 0]) / s, (r[1, 0] - r[0, 1]) / s]
    else:
        i = int(np.argmax(np.diag(r)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(1.0 + r[i, i] - r[j, j] - r[k, k]) * 2
        q = [0.0, 0.0, 0.0, 0.0]
        q[0] = (r[k, j] - r[j, k]) / s
        q[i + 1] = 0.25 * s
        q[j + 1] = (r[j, i] + r[i, j]) / s
        q[k + 1] = (r[k, i] + r[i, k]) / s
    q = np.asarray(q)
    return q if q[0] >= 0 else -q


def box_corners(center: np.ndarray, wlh, rot: np.ndarray) -> np.ndarray:
    """(3, 8) corners; box frame: x=length, y=width, z=height
    (nuScenes Box.corners convention)."""
    w, l, h = wlh
    sx = np.array([1, 1, 1, 1, -1, -1, -1, -1]) * l / 2
    sy = np.array([1, -1, -1, 1, 1, -1, -1, 1]) * w / 2
    sz = np.array([1, 1, -1, -1, 1, 1, -1, -1]) * h / 2
    return rot @ np.vstack([sx, sy, sz]) + center.reshape(3, 1)


def project_to_image_bbox(center, wlh, rot, p_left,
                          imsize=IMSIZE) -> Optional[Tuple[float, ...]]:
    """Project a camera-frame 3D box (TRUE center) to a clipped 2D bbox;
    None when fully behind the camera or outside the image
    (reference: utils_kitti.py:154-192)."""
    corners = box_corners(np.asarray(center, np.float64), wlh, rot)
    corners = corners[:, corners[2] > 0]
    if corners.shape[1] == 0:
        return None
    uvw = p_left[:3, :3] @ corners + p_left[:3, 3:4]
    uv = uvw[:2] / uvw[2]
    x0, y0 = uv.min(axis=1)
    x1, y1 = uv.max(axis=1)
    x0, x1 = np.clip([x0, x1], 0, imsize[0])
    y0, y1 = np.clip([y0, y1], 0, imsize[1])
    if x0 >= x1 or y0 >= y1:
        return None
    return float(x0), float(y0), float(x1), float(y1)


def box_to_label_line(name: str, center, wlh, rot, bbox_2d,
                      truncation=0.0, occlusion=0, alpha=-10.0,
                      score=None) -> str:
    """KITTI label line for a rectified-camera-frame box whose center is
    the BOTTOM face center (reference: utils_kitti.py:379-415)."""
    v = rot @ np.array([1.0, 0.0, 0.0])
    yaw = -np.arctan2(v[2], v[0])
    fields = [name, f"{truncation:.2f}", f"{occlusion:d}", f"{alpha:.2f}",
              *(f"{b:.2f}" for b in bbox_2d),
              f"{wlh[2]:.2f}", f"{wlh[0]:.2f}", f"{wlh[1]:.2f}",
              *(f"{c:.2f}" for c in center), f"{yaw:.2f}"]
    if score is not None and not np.isnan(score):
        fields.append(f"{score:.4f}")
    return " ".join(fields)


def parse_label_line(line: str) -> Dict:
    """(reference: utils_kitti.py:91-118)"""
    p = line.split(" ")
    return {
        "name": p[0].strip(),
        "truncation": float(p[1]), "occlusion": float(p[2]),
        "alpha": float(p[3]),
        "bbox_camera": tuple(float(v) for v in p[4:8]),
        "wlh": (float(p[9]), float(p[10]), float(p[8])),
        "xyz_camera": np.array([float(p[11]), float(p[12]), float(p[13])]),
        "yaw_camera": float(p[14]),
        "score": float(p[15]) if len(p) > 15 else float("nan"),
    }


def write_calib(path: str, p_left: np.ndarray, velo_to_cam: np.ndarray):
    """(reference: export_kitti.py:181-199)"""
    rows = {
        "P0": np.zeros((3, 4)), "P1": np.zeros((3, 4)),
        "P2": p_left, "P3": np.zeros((3, 4)),
        "R0_rect": np.eye(3), "Tr_velo_to_cam": velo_to_cam[:3],
        "Tr_imu_to_velo": np.zeros((3, 4)),
    }
    with open(path, "w") as f:
        for key, val in rows.items():
            f.write(key + ": " +
                    " ".join("%.12e" % v for v in val.flatten()) + "\n")


def read_calib(path: str) -> Dict[str, np.ndarray]:
    """(reference: utils_kitti.py:216-253)"""
    out = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, vals = line.split(":", 1)
            out[key.strip()] = np.array(
                [float(v) for v in vals.split()], np.float64)
    return {
        "velo_to_cam_R": out["Tr_velo_to_cam"].reshape(3, 4)[:, :3],
        "velo_to_cam_T": out["Tr_velo_to_cam"].reshape(3, 4)[:, 3],
        "r0_rect": out["R0_rect"].reshape(3, 3),
        "p_left": out["P2"].reshape(3, 4),
    }


class NuScenesKittiConverter:
    """Drives both conversion directions over the raw DB tables."""

    def __init__(self, data_path: str, version: str = "v1.0-mini",
                 cam_name: str = "CAM_FRONT",
                 lidar_name: str = "LIDAR_TOP",
                 image_count: int = 10,
                 scenes: Optional[List[str]] = None):
        from centertrack_tpu.tools.convert_nuscenes_to_coco import (
            Tables, DETECTION_NAME)
        self.t = Tables(data_path, version)
        self.data_path = data_path
        self.cam_name = cam_name
        self.lidar_name = lidar_name
        self.image_count = image_count
        self.detection_name = DETECTION_NAME
        # key-frame sample_data per (sample, channel)
        self.sd_of: Dict[Tuple[str, str], dict] = {}
        for sd in self.t.sample_data.values():
            if not sd.get("is_key_frame", False):
                continue
            cs = self.t.calibrated_sensor[sd["calibrated_sensor_token"]]
            channel = self.t.sensor[cs["sensor_token"]]["channel"]
            self.sd_of[(sd["sample_token"], channel)] = sd
        self.sample_tokens = self._ordered_samples(scenes)

    def _ordered_samples(self, scenes: Optional[List[str]]) -> List[str]:
        toks = []
        for scene in sorted(self.t.scene.values(),
                            key=lambda s: s["name"]):
            if scenes is not None and scene["name"] not in scenes:
                continue
            tok = scene["first_sample_token"]
            while tok:
                toks.append(tok)
                tok = self.t.sample[tok]["next"]
        return toks[:self.image_count] if self.image_count else toks

    # -----------------------------------------------------------------
    def _transforms(self, sample_token: str):
        """velo->cam-kitti rotation/translation + P2 for one sample."""
        sd_cam = self.sd_of[(sample_token, self.cam_name)]
        sd_lid = self.sd_of[(sample_token, self.lidar_name)]
        cs_cam = self.t.calibrated_sensor[sd_cam["calibrated_sensor_token"]]
        cs_lid = self.t.calibrated_sensor[sd_lid["calibrated_sensor_token"]]
        r_lid = rot_of(cs_lid["rotation"])
        t_lid = np.asarray(cs_lid["translation"])
        r_cam = rot_of(cs_cam["rotation"])
        t_cam = np.asarray(cs_cam["translation"])
        # ego_to_cam . lid_to_ego . kitti_to_nu  (export_kitti.py:126-133)
        r = r_cam.T @ r_lid @ KITTI_TO_NU_LIDAR
        t = r_cam.T @ (r_lid @ np.zeros(3) + t_lid - t_cam)
        p_left = np.zeros((3, 4))
        p_left[:3, :3] = np.asarray(cs_cam["camera_intrinsic"])
        return r, t, p_left, sd_cam, sd_lid, cs_lid

    def _boxes_in_nu_lidar(self, sample_token: str, sd_lid, cs_lid):
        """GT boxes of a sample in the nuScenes LIDAR frame."""
        pose = self.t.ego_pose[sd_lid["ego_pose_token"]]
        r_pose = rot_of(pose["rotation"])
        t_pose = np.asarray(pose["translation"])
        r_cs = rot_of(cs_lid["rotation"])
        t_cs = np.asarray(cs_lid["translation"])
        out = []
        for ann in self.t.ann_by_sample.get(sample_token, []):
            inst = self.t.instance[ann["instance_token"]]
            cat = self.t.category[inst["category_token"]]["name"]
            name = self.detection_name.get(cat)
            if name is None:
                continue
            center_g = np.asarray(ann["translation"])
            rot_g = rot_of(ann["rotation"])
            center = r_cs.T @ (r_pose.T @ (center_g - t_pose) - t_cs)
            rot = r_cs.T @ r_pose.T @ rot_g
            out.append({"name": name, "center": center, "rot": rot,
                        "wlh": list(ann["size"]), "token": ann["token"]})
        return out

    # -----------------------------------------------------------------
    def nuscenes_gt_to_kitti(self, out_dir: str, split: str = "train",
                             copy_images: bool = True,
                             convert_lidar: bool = True) -> List[str]:
        """(reference: export_kitti.py:83-243). Returns written tokens."""
        folders = {k: os.path.join(out_dir, split, k)
                   for k in ("label_2", "calib", "image_2", "velodyne")}
        for f in folders.values():
            os.makedirs(f, exist_ok=True)
        tokens = []
        for sample_token in self.sample_tokens:
            r_vc, t_vc, p_left, sd_cam, sd_lid, cs_lid = \
                self._transforms(sample_token)
            write_calib(os.path.join(folders["calib"],
                                     sample_token + ".txt"),
                        p_left, np.hstack([r_vc, t_vc.reshape(3, 1)]))

            if copy_images:
                self._convert_image(sd_cam, os.path.join(
                    folders["image_2"], sample_token + ".png"))
            if convert_lidar:
                self._convert_lidar(sd_lid, os.path.join(
                    folders["velodyne"], sample_token + ".bin"))

            lines = []
            for box in self._boxes_in_nu_lidar(sample_token, sd_lid,
                                               cs_lid):
                # nu-lidar -> kitti-lidar -> camera (export semantics of
                # utils_kitti.box_nuscenes_to_kitti)
                rot_cam = r_vc @ KITTI_TO_NU_LIDAR.T @ box["rot"]
                center_cam = (r_vc @ KITTI_TO_NU_LIDAR.T @ box["center"]
                              + t_vc)
                bbox_2d = project_to_image_bbox(center_cam, box["wlh"],
                                                rot_cam, p_left)
                if bbox_2d is None:
                    continue
                # KITTI stores the bottom-face center (y down):
                bottom = center_cam + np.array([0, box["wlh"][2] / 2, 0])
                lines.append(box_to_label_line(
                    box["name"], bottom, box["wlh"], rot_cam, bbox_2d,
                    score=0.0))
            with open(os.path.join(folders["label_2"],
                                   sample_token + ".txt"), "w") as f:
                f.write("\n".join(lines) + ("\n" if lines else ""))
            tokens.append(sample_token)
        with open(os.path.join(out_dir, split, "tokens.json"), "w") as f:
            json.dump(tokens, f)
        return tokens

    def _convert_image(self, sd_cam, dst):
        import cv2
        src = os.path.join(self.data_path, sd_cam["filename"])
        if os.path.exists(src) and not os.path.exists(dst):
            img = cv2.imread(src)
            if img is not None:
                cv2.imwrite(dst, img)

    def _convert_lidar(self, sd_lid, dst):
        src = os.path.join(self.data_path, sd_lid["filename"])
        if not os.path.exists(src) or os.path.exists(dst):
            return
        pts = np.fromfile(src, np.float32).reshape(-1, 5)[:, :4]
        # rotate into KITTI lidar frame (x forward)
        pts[:, :3] = pts[:, :3] @ KITTI_TO_NU_LIDAR  # == (R^-1 p)^T rows
        pts.astype(np.float32).tofile(dst)


def kitti_boxes_to_nu_lidar(label_path: str, calib_path: str,
                            max_dist: Optional[float] = None,
                            filter_classes: Optional[List[str]] = None
                            ) -> List[Dict]:
    """Read a KITTI label/result file back into nuScenes-LIDAR-frame
    boxes (reference: utils_kitti.py:268-345)."""
    calib = read_calib(calib_path)
    r_vc = calib["velo_to_cam_R"]
    t_vc = calib["velo_to_cam_T"]
    r0 = calib["r0_rect"]
    boxes = []
    with open(label_path) as f:
        for line in f:
            if not line.strip():
                continue
            p = parse_label_line(line)
            if p["name"] in ("DontCare", "Misc"):
                continue
            if filter_classes is not None and \
                    p["name"] not in filter_classes:
                continue
            w, l, h = p["wlh"]
            yaw = p["yaw_camera"]
            # camera-frame box rotation: roty(yaw) . rotx(pi/2)
            # (utils_kitti.py:306-311)
            roty = np.array([[np.cos(yaw), 0, np.sin(yaw)],
                             [0, 1, 0],
                             [-np.sin(yaw), 0, np.cos(yaw)]])
            rotx = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0.0]])
            rot_cam = roty @ rotx
            center_cam = p["xyz_camera"] + np.array([0, -h / 2, 0])
            # rectified camera -> camera -> kitti lidar -> nu lidar
            rot_l = r_vc.T @ r0.T @ rot_cam
            center_l = r_vc.T @ (r0.T @ center_cam - t_vc)
            rot_nu = KITTI_TO_NU_LIDAR @ rot_l
            center_nu = KITTI_TO_NU_LIDAR @ center_l
            if max_dist is not None and \
                    float(np.hypot(*center_nu[:2])) > max_dist:
                continue
            boxes.append({
                "name": p["name"], "center": center_nu, "rot": rot_nu,
                "wlh": (w, l, h), "score": p["score"],
            })
    return boxes


def kitti_res_to_nuscenes(kitti_dir: str, split: str,
                          out_path: str,
                          label_dir: Optional[str] = None,
                          meta: Optional[Dict] = None) -> Dict:
    """KITTI result files -> nuScenes detection submission
    (reference: export_kitti.py:271-318; boxes are reported in the
    nuScenes LIDAR frame, matching the reference's behavior)."""
    if meta is None:
        meta = {"use_camera": False, "use_lidar": True,
                "use_radar": False, "use_map": False,
                "use_external": False}
    base = os.path.join(kitti_dir, split)
    with open(os.path.join(base, "tokens.json")) as f:
        tokens = json.load(f)
    label_dir = label_dir or os.path.join(base, "label_2")
    results = {}
    for tok in tokens:
        boxes = kitti_boxes_to_nu_lidar(
            os.path.join(label_dir, tok + ".txt"),
            os.path.join(base, "calib", tok + ".txt"))
        results[tok] = [{
            "sample_token": tok,
            "translation": [float(v) for v in b["center"]],
            "size": [float(v) for v in b["wlh"]],
            "rotation": [float(v) for v in quat_of_matrix(b["rot"])],
            "velocity": [0.0, 0.0],
            "detection_name": b["name"],
            "detection_score": (0.0 if np.isnan(b["score"])
                                else float(b["score"])),
            "attribute_name": "",
        } for b in boxes]
    submission = {"meta": meta, "results": results}
    with open(out_path, "w") as f:
        json.dump(submission, f, indent=2)
    return submission


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gt_to_kitti")
    g.add_argument("--data_path", required=True)
    g.add_argument("--version", default="v1.0-mini")
    g.add_argument("--out_dir", required=True)
    g.add_argument("--split", default="train")
    g.add_argument("--cam", default="CAM_FRONT")
    g.add_argument("--lidar", default="LIDAR_TOP")
    g.add_argument("--image_count", type=int, default=10)
    g.add_argument("--scenes", nargs="*", default=None)
    g.add_argument("--no_images", action="store_true")
    g.add_argument("--no_lidar", action="store_true")
    r = sub.add_parser("res_to_nuscenes")
    r.add_argument("--kitti_dir", required=True)
    r.add_argument("--split", default="train")
    r.add_argument("--label_dir", default=None)
    r.add_argument("--out", required=True)
    args = ap.parse_args()
    if args.cmd == "gt_to_kitti":
        conv = NuScenesKittiConverter(
            args.data_path, args.version, cam_name=args.cam,
            lidar_name=args.lidar, image_count=args.image_count,
            scenes=args.scenes)
        toks = conv.nuscenes_gt_to_kitti(
            args.out_dir, args.split, copy_images=not args.no_images,
            convert_lidar=not args.no_lidar)
        print(f"wrote {len(toks)} samples to {args.out_dir}/{args.split}")
    else:
        sub = kitti_res_to_nuscenes(args.kitti_dir, args.split, args.out,
                                    label_dir=args.label_dir)
        n = sum(len(v) for v in sub["results"].values())
        print(f"wrote {n} boxes for {len(sub['results'])} samples "
              f"to {args.out}")


if __name__ == "__main__":
    main()
