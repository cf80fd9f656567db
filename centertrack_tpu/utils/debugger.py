"""Visual debugging suite (reference: src/lib/utils/debugger.py).

Named-image registry with heatmap colormaps, box/pose/track-arrow
overlays, projected 3D boxes and a bird's-eye view.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import cv2
import numpy as np

from centertrack_tpu.utils.ddd import compute_box_3d, project_to_image


def _color_for_id(i: int):
    rng = np.random.RandomState(i * 7919 + 13)
    return tuple(int(c) for c in rng.randint(60, 255, 3))


class Debugger:
    def __init__(self, cfg=None, dataset=None, theme: str = "white",
                 num_classes: int = -1):
        self.imgs: Dict[str, np.ndarray] = {}
        self.theme = theme
        self.cfg = cfg
        if dataset is not None:
            self.names = getattr(dataset, "class_name", None)
            self.num_classes = getattr(dataset, "num_categories",
                                       num_classes)
            self.edges = getattr(dataset, "edges", [])
        else:
            self.names = None
            self.num_classes = num_classes
            self.edges = []
        rng = np.random.RandomState(1)
        self.colors = rng.randint(0, 255, (max(self.num_classes, 1), 3))
        self.world_size = 64  # meters for bird view
        self.out_size = 384

    def clear(self):
        self.imgs = {}

    def add_img(self, img: np.ndarray, img_id: str = "default"):
        self.imgs[img_id] = img.copy()

    # -------------------------------------------------------------- hm
    def gen_colormap(self, hm: np.ndarray,
                     output_res=None) -> np.ndarray:
        """Per-class colored heatmap (reference: debugger.py:83-99).
        hm: (C, H, W) or (H, W, C)."""
        if hm.ndim == 3 and hm.shape[0] <= hm.shape[2]:
            hm = hm.transpose(1, 2, 0)  # -> H, W, C
        h, w, c = hm.shape
        if output_res is None:
            output_res = (h * 4, w * 4)
        color_map = np.zeros((h, w, 3), np.float32)
        for i in range(c):
            color = self.colors[i % len(self.colors)]
            color_map = np.maximum(
                color_map, hm[:, :, i:i + 1] * color[None, None])
        color_map = cv2.resize(
            color_map, (output_res[1], output_res[0]))
        return color_map.astype(np.uint8)

    gen_colormap_hp = gen_colormap

    def add_blend_img(self, back: np.ndarray, fore: np.ndarray,
                      img_id: str = "blend", trans: float = 0.8):
        """(reference: debugger.py:64-74)"""
        if fore.shape[:2] != back.shape[:2]:
            fore = cv2.resize(fore, (back.shape[1], back.shape[0]))
        img = back * (1.0 - trans) + fore * trans
        self.imgs[img_id] = np.clip(img, 0, 255).astype(np.uint8)

    # ----------------------------------------------------------- boxes
    def add_coco_bbox(self, bbox, cat: int, conf=1.0,
                      show_txt: bool = True, img_id: str = "default"):
        """(reference: debugger.py:120-141)"""
        bbox = np.array(bbox, np.int32)
        cat = int(cat)
        color = tuple(int(c) for c in self.colors[cat % len(self.colors)])
        txt = "{}{:.1f}".format(
            self.names[cat] if self.names and cat < len(self.names)
            else cat, conf)
        cv2.rectangle(self.imgs[img_id], (bbox[0], bbox[1]),
                      (bbox[2], bbox[3]), color, 2)
        if show_txt:
            cv2.putText(self.imgs[img_id], txt,
                        (bbox[0], max(bbox[1] - 4, 0)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1,
                        lineType=cv2.LINE_AA)

    def add_tracking_id(self, ct, tracking_id, img_id: str = "default"):
        cv2.putText(self.imgs[img_id], str(int(tracking_id)),
                    (int(ct[0]), int(ct[1])), cv2.FONT_HERSHEY_SIMPLEX,
                    0.6, _color_for_id(int(tracking_id)), 2,
                    lineType=cv2.LINE_AA)

    def add_arrow(self, st, ed, img_id: str = "default"):
        """Tracking displacement arrow (reference: debugger.py:416-422)."""
        st = (int(st[0]), int(st[1]))
        ed = (int(st[0] + ed[0]), int(st[1] + ed[1]))
        cv2.arrowedLine(self.imgs[img_id], st, ed, (0, 0, 255), 2,
                        line_type=cv2.LINE_AA)

    def add_coco_hp(self, points, tracking_id: int = 0,
                    img_id: str = "default"):
        """17-joint skeleton (reference: debugger.py:143-162)."""
        points = np.array(points, np.int32).reshape(-1, 2)
        for j in range(points.shape[0]):
            cv2.circle(self.imgs[img_id], (points[j, 0], points[j, 1]),
                       2, (255, 0, 255), -1)
        for e in self.edges:
            if e[0] < len(points) and e[1] < len(points):
                if (points[e] >= 0).all():
                    cv2.line(self.imgs[img_id],
                             (points[e[0], 0], points[e[0], 1]),
                             (points[e[1], 0], points[e[1], 1]),
                             (255, 0, 255), 1, lineType=cv2.LINE_AA)

    # -------------------------------------------------------------- 3D
    def add_3d_detection(self, image_or_path, flipped, dets, calib,
                         vis_thresh: float = 0.3,
                         img_id: str = "det_pred"):
        """Project 3D boxes into the image
        (reference: debugger.py:283-331)."""
        if isinstance(image_or_path, str):
            img = cv2.imread(image_or_path)
        else:
            img = image_or_path.copy()
        if flipped:
            img = img[:, ::-1].copy()
        for item in dets:
            if item["score"] > vis_thresh and "dim" in item \
                    and "loc" in item and "rot_y" in item:
                cl = tuple(int(c) for c in self.colors[
                    (int(item["class"]) - 1) % len(self.colors)])
                if item["dim"][0] > 0 and item["loc"][2] > 1:
                    box_3d = compute_box_3d(
                        item["dim"], item["loc"], item["rot_y"])
                    box_2d = project_to_image(
                        box_3d, np.asarray(calib, np.float32))
                    self._draw_box_3d(img, box_2d.astype(np.int32), cl)
        self.imgs[img_id] = img

    @staticmethod
    def _draw_box_3d(image, corners, c):
        face_idx = [[0, 1, 5, 4], [1, 2, 6, 5],
                    [3, 0, 4, 7], [2, 3, 7, 6]]
        for ind_f in range(3, -1, -1):
            f = face_idx[ind_f]
            for j in range(4):
                cv2.line(image,
                         (corners[f[j], 0], corners[f[j], 1]),
                         (corners[f[(j + 1) % 4], 0],
                          corners[f[(j + 1) % 4], 1]), c, 2,
                         lineType=cv2.LINE_AA)
        return image

    def add_bird_view(self, dets, vis_thresh: float = 0.3,
                      img_id: str = "bird", cnt: int = 0):
        """Top-down view of 3D detections
        (reference: debugger.py:358-393)."""
        bird = np.ones((self.out_size, self.out_size, 3), np.uint8) * 230
        for item in dets:
            if item["score"] > vis_thresh and "dim" in item \
                    and "loc" in item and "rot_y" in item:
                dim = item["dim"]
                loc = item["loc"]
                rot_y = item["rot_y"]
                rect = self._bev_rect(dim, loc, rot_y)
                cl = tuple(int(c) for c in self.colors[
                    (int(item["class"]) - 1) % len(self.colors)])
                for k in range(4):
                    cv2.line(bird, tuple(rect[k]),
                             tuple(rect[(k + 1) % 4]), cl, 2,
                             lineType=cv2.LINE_AA)
        self.imgs[img_id] = bird

    def add_bird_views(self, dets_dt, dets_gt, vis_thresh: float = 0.3,
                       img_id: str = "bird_compare"):
        """(reference: debugger.py:395-415)"""
        self.add_bird_view(dets_dt, vis_thresh, img_id)
        bird = self.imgs[img_id]
        for item in dets_gt:
            if "dim" in item and "loc" in item and "rot_y" in item:
                rect = self._bev_rect(item["dim"], item["loc"],
                                      item["rot_y"])
                for k in range(4):
                    cv2.line(bird, tuple(rect[k]),
                             tuple(rect[(k + 1) % 4]), (0, 0, 255), 1,
                             lineType=cv2.LINE_AA)

    def _bev_rect(self, dim, loc, rot_y):
        c, s = np.cos(rot_y), np.sin(rot_y)
        r = np.array([[c, s], [-s, c]], np.float32)
        l, w = dim[2], dim[1]
        corners = np.array([[l / 2, w / 2], [l / 2, -w / 2],
                            [-l / 2, -w / 2], [-l / 2, w / 2]],
                           np.float32) @ r.T
        corners = corners + np.array([loc[0], loc[2]], np.float32)
        # world (x right, z forward) -> pixels
        scale = self.out_size / self.world_size
        px = (corners[:, 0] * scale + self.out_size / 2).astype(np.int32)
        py = (self.out_size - corners[:, 1] * scale).astype(np.int32)
        return np.stack([px, py], axis=1)

    # ------------------------------------------------------------- io
    def save_all_imgs(self, path: str, prefix: str = ""):
        os.makedirs(path, exist_ok=True)
        for k, v in self.imgs.items():
            cv2.imwrite(os.path.join(path, f"{prefix}{k}.png"), v)

    def show_all_imgs(self, pause: bool = False):
        # headless environments: save instead of cv2.imshow
        self.save_all_imgs("debug_out")
