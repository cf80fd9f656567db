"""Generic COCO-json dataset: augmentation + GT target generation
(reference: src/lib/dataset/generic_dataset.py).

TPU-first split of work:
  * host (here): image decode, affine warp, color aug, per-object scalar
    targets (ind/cat/wh/reg/tracking/...), and COMPACT splat descriptors
    (integer centers + radii + class per object);
  * device (ops/gaussian.render_gaussians, called inside the jitted train
    step): the dense heatmap rendering the reference does serially on CPU
    (generic_dataset.py:423-515, :205-255).

Every output array has fixed capacity so the train step compiles once.
"""

from __future__ import annotations

import math
import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from centertrack_tpu.data.coco_api import COCO
from centertrack_tpu.ops.affine import affine_transform, get_affine_transform
from centertrack_tpu.ops.gaussian import gaussian_radius, draw_umich_gaussian


def color_aug(data_rng, image, eig_val, eig_vec, var=0.4):
    """CornerNet-style photometric jitter, fused into one array pass.

    Semantically equivalent to the reference (utils/image.py:211-243),
    which mutates the image three times (brightness/contrast/saturation
    in random order) and then adds PCA lighting noise. Each of those ops
    is affine in the ORIGINAL image I and its grayscale G:

        brightness(a): out = a*out
        contrast(a):   out = a*out + (1-a)*mean(G)
        saturation(a): out = a*out + (1-a)*G

    so the whole permutation folds into scalar coefficients
    (ci, cg, cb) with  out = ci*I + cg*G + cb + lighting  — a single
    fused expression instead of three full-image passes. The RNG stream
    (permutation, three uniforms in permuted order, one normal(3)) is
    drawn identically to the reference, so outputs match bit-for-bit up
    to float associativity.

    Returns the augmented image (float32 HWC, same scale as input).
    """
    gray = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
    gray_mean = float(gray.mean())
    # fold the randomly-ordered affine ops into (ci, cg, cb)
    ci, cg, cb = 1.0, 0.0, 0.0
    for op in data_rng.permutation(3):
        alpha = 1.0 + data_rng.uniform(low=-var, high=var)
        ci, cg, cb = alpha * ci, alpha * cg, alpha * cb
        if op == 1:    # contrast: blend toward the gray mean
            cb += (1.0 - alpha) * gray_mean
        elif op == 2:  # saturation: blend toward per-pixel gray
            cg += 1.0 - alpha
    lighting = eig_vec @ (eig_val * data_rng.normal(scale=0.1, size=(3,)))
    return (ci * image + cg * gray[:, :, None] +
            (cb + lighting).astype(np.float32)).astype(np.float32)


class GenericDataset:
    """Base dataset. Subclasses set the class attributes
    (reference: generic_dataset.py:21-52)."""

    is_fusion_dataset = False
    default_resolution: Optional[Tuple[int, int]] = None
    num_categories: Optional[int] = None
    class_name: Optional[List[str]] = None
    cat_ids: Optional[Dict[int, int]] = None
    max_objs: Optional[int] = None
    rest_focal_length = 1200
    num_joints = 17
    flip_idx = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10],
                [11, 12], [13, 14], [15, 16]]
    edges = [[0, 1], [0, 2], [1, 3], [2, 4],
             [4, 6], [3, 5], [5, 6],
             [5, 7], [7, 9], [6, 8], [8, 10],
             [6, 12], [5, 11], [11, 12],
             [12, 14], [14, 16], [11, 13], [13, 15]]
    mean = np.array([0.40789654, 0.44719302, 0.47026115],
                    dtype=np.float32).reshape(1, 1, 3)
    std = np.array([0.28863828, 0.27408164, 0.27809835],
                   dtype=np.float32).reshape(1, 1, 3)
    _eig_val = np.array([0.2141788, 0.01817699, 0.00341571],
                        dtype=np.float32)
    _eig_vec = np.array([
        [-0.58752847, -0.69563484, 0.41340352],
        [-0.5832747, 0.00994535, -0.81221408],
        [-0.56089297, 0.71832671, 0.41158938]
    ], dtype=np.float32)
    ignore_val = 1
    max_ignore_regions = 16
    nuscenes_att_range = {0: [0, 1], 1: [0, 1], 2: [2, 3, 4], 3: [2, 3, 4],
                          4: [2, 3, 4], 5: [5, 6, 7], 6: [5, 6, 7],
                          7: [5, 6, 7]}

    def __init__(self, cfg=None, split=None, ann_path=None, img_dir=None):
        if cfg is not None and split is not None:
            self.split = split
            self.cfg = cfg
            self._data_rng = np.random.RandomState(123)
        if ann_path is not None and img_dir is not None:
            print(f"==> initializing {split} data from {ann_path},\n"
                  f" images from {img_dir} ...")
            self.coco = COCO(ann_path)
            self.images = self.coco.getImgIds()
            if cfg.tracking:
                if "videos" not in self.coco.dataset:
                    self.fake_video_data()
                self.video_to_images = defaultdict(list)
                for image in self.coco.dataset["images"]:
                    self.video_to_images[image["video_id"]].append(image)
            self.img_dir = img_dir

    def __len__(self):
        return len(self.images)

    # ------------------------------------------------------------------
    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        img, anns, img_info, img_path = self._load_data(index)

        height, width = img.shape[0], img.shape[1]
        c = np.array([img.shape[1] / 2.0, img.shape[0] / 2.0], np.float32)
        s = (max(img.shape[0], img.shape[1]) * 1.0
             if not cfg.not_max_crop
             else np.array([img.shape[1], img.shape[0]], np.float32))
        aug_s, rot, flipped = 1, 0, 0
        if self.split == "train":
            c, aug_s, rot = self._get_aug_param(c, s, width, height)
            s = s * aug_s
            if np.random.random() < cfg.flip:
                flipped = 1
                img = img[:, ::-1, :]
                anns = self._flip_anns(anns, width)

        trans_input = get_affine_transform(
            c, s, rot, [cfg.input_w, cfg.input_h])
        trans_output = get_affine_transform(
            c, s, rot, [cfg.output_w, cfg.output_h])
        inp = self._get_input(img, trans_input)
        ret = {"image": inp}

        pre_cts, track_ids = None, None
        if cfg.tracking:
            pre_image, pre_anns, frame_dist = self._load_pre_data(
                img_info["video_id"], img_info["frame_id"],
                img_info.get("sensor_id", 1))
            if flipped:
                pre_image = pre_image[:, ::-1, :].copy()
                pre_anns = self._flip_anns(pre_anns, width)
            if cfg.same_aug_pre and frame_dist != 0:
                trans_input_pre = trans_input
                trans_output_pre = trans_output
            else:
                c_pre, aug_s_pre, _ = self._get_aug_param(
                    c.copy(), s, width, height, disturb=True)
                s_pre = s * aug_s_pre
                trans_input_pre = get_affine_transform(
                    c_pre, s_pre, rot, [cfg.input_w, cfg.input_h])
                trans_output_pre = get_affine_transform(
                    c_pre, s_pre, rot, [cfg.output_w, cfg.output_h])
            pre_img = self._get_input(pre_image, trans_input_pre)
            pre_splats, pre_cts, track_ids = self._get_pre_dets(
                pre_anns, trans_input_pre, trans_output_pre)
            ret["pre_img"] = pre_img
            if cfg.pre_hm:
                ret.update(pre_splats)

        self._init_ret(ret)
        calib = self._get_calib(img_info, width, height)
        self._add_instances(ret, anns[:self.max_objs], trans_output,
                            aug_s, calib, pre_cts, track_ids)

        ret["meta_c"] = c.astype(np.float32)
        ret["meta_s"] = np.array(
            s if isinstance(s, np.ndarray) else [s, s], np.float32)
        ret["calib"] = calib.astype(np.float32)
        ret["image_id"] = np.int64(img_info["id"])
        return ret

    # ------------------------------------------------------------------
    def _load_image_anns(self, img_id, coco, img_dir):
        img_info = coco.loadImgs([img_id])[0]
        img_path = os.path.join(img_dir, img_info["file_name"])
        ann_ids = coco.getAnnIds(imgIds=[img_id])
        import copy as _copy
        anns = _copy.deepcopy(coco.loadAnns(ann_ids))
        img = cv2.imread(img_path)
        return img, anns, img_info, img_path

    def _load_data(self, index):
        img_id = self.images[index]
        return self._load_image_anns(img_id, self.coco, self.img_dir)

    def _pre_frame_candidates(self, video_id, frame_id, sensor_id, lo, hi):
        """Frames of the same video/sensor whose frame distance to
        `frame_id` lies in [lo, hi]."""
        return [(info["id"], info["frame_id"])
                for info in self.video_to_images[video_id]
                if lo <= info["frame_id"] - frame_id <= hi
                and info.get("sensor_id", sensor_id) == sensor_id]

    def _load_pre_data(self, video_id, frame_id, sensor_id=1):
        """Pick and load the 'previous' frame (reference semantics:
        generic_dataset.py:179-202). Training samples uniformly within
        +/-(max_frame_dist-1) — including the frame itself — which is
        the temporal augmentation the tracker is trained under; eval
        deterministically uses frame_id-1, falling back to the frame
        itself at video starts."""
        if "train" in self.split:
            d = self.cfg.max_frame_dist - 1
            cands = self._pre_frame_candidates(
                video_id, frame_id, sensor_id, -d, d)
        else:
            cands = (self._pre_frame_candidates(
                         video_id, frame_id, sensor_id, -1, -1) or
                     self._pre_frame_candidates(
                         video_id, frame_id, sensor_id, 0, 0))
        img_id, pre_frame_id = cands[np.random.choice(len(cands))]
        img, anns, _, _ = self._load_image_anns(img_id, self.coco,
                                                self.img_dir)
        return img, anns, abs(frame_id - pre_frame_id)

    def _get_pre_dets(self, anns, trans_input, trans_output):
        """Previous-frame centers with simulated tracker noise
        (reference: generic_dataset.py:205-255). Instead of rendering the
        pre_hm here, emit splat descriptors for the on-device render.

        Capacity: 2 * max_objs (each object may add one fp_disturb splat).
        """
        cfg = self.cfg
        hm_h, hm_w = cfg.input_h, cfg.input_w
        down_ratio = cfg.down_ratio
        cap = 2 * self.max_objs
        cts_int = np.zeros((cap, 2), np.int32)
        radii = np.zeros((cap,), np.int32)
        ks = np.zeros((cap,), np.float32)
        valid = np.zeros((cap,), bool)
        n = 0
        pre_cts, track_ids = [], []
        for ann in anns:
            cls_id = int(self.cat_ids[ann["category_id"]])
            if (cls_id > cfg.num_classes or cls_id <= -99 or
                    ("iscrowd" in ann and ann["iscrowd"] > 0)):
                continue
            bbox = self._coco_box_to_bbox(ann["bbox"])
            bbox[:2] = affine_transform(bbox[:2], trans_input)
            bbox[2:] = affine_transform(bbox[2:], trans_input)
            bbox[[0, 2]] = np.clip(bbox[[0, 2]], 0, hm_w - 1)
            bbox[[1, 3]] = np.clip(bbox[[1, 3]], 0, hm_h - 1)
            h, w = bbox[3] - bbox[1], bbox[2] - bbox[0]
            if h > 0 and w > 0:
                radius = gaussian_radius((math.ceil(h), math.ceil(w)))
                radius = max(0, int(radius))
                ct = np.array([(bbox[0] + bbox[2]) / 2,
                               (bbox[1] + bbox[3]) / 2], np.float32)
                ct0 = ct.copy()

                ct[0] = ct[0] + np.random.randn() * cfg.hm_disturb * w
                ct[1] = ct[1] + np.random.randn() * cfg.hm_disturb * h
                conf = 1 if np.random.random() > cfg.lost_disturb else 0

                ct_int = ct.astype(np.int32)
                if conf == 0:
                    pre_cts.append(ct / down_ratio)
                else:
                    pre_cts.append(ct0 / down_ratio)
                track_ids.append(ann.get("track_id", -1))
                if n < cap:
                    cts_int[n] = ct_int
                    radii[n] = radius
                    ks[n] = conf
                    valid[n] = True
                    n += 1

                if np.random.random() < cfg.fp_disturb and cfg.pre_hm:
                    ct2 = ct0.copy()
                    ct2[0] = ct2[0] + np.random.randn() * 0.05 * w
                    ct2[1] = ct2[1] + np.random.randn() * 0.05 * h
                    if n < cap:
                        cts_int[n] = ct2.astype(np.int32)
                        radii[n] = radius
                        ks[n] = conf
                        valid[n] = True
                        n += 1
        splats = {"pre_cts_int": cts_int, "pre_radii": radii,
                  "pre_ks": ks, "pre_valid": valid}
        return splats, pre_cts, track_ids

    @staticmethod
    def _safe_crop_margin(border, size):
        """Largest margin of the form border//2^k that leaves a
        non-empty randint range inside `size` (reference semantics of
        generic_dataset.py:258-262, expressed as a halving search)."""
        margin = border
        div = 1
        while size <= 2 * margin:
            div *= 2
            margin = border // div
        return margin

    def _get_aug_param(self, c, s, width, height, disturb=False):
        """Sample the geometric augmentation (center, scale factor,
        rotation). Two regimes, matching reference
        generic_dataset.py:264-286:

          * random-crop (training default): scale drawn from the
            discrete ladder {0.6..1.3}, center uniform inside a safe
            margin;
          * jitter (``not_rand_crop`` or the pre-frame ``disturb``
            pass): Gaussian shift proportional to the image scale and a
            Gaussian scale factor, both clipped to 2 sigma.

        NOTE the reference's own jitter branch has a list*float type
        bug when s is scalar; the semantics here are the intended ones.
        The RNG consumption order is kept identical for reproducibility.
        """
        cfg = self.cfg
        use_crop = (not cfg.not_rand_crop) and not disturb
        if use_crop:
            scale_ladder = np.arange(0.6, 1.4, 0.1)
            aug_s = np.random.choice(scale_ladder)
            margins = [self._safe_crop_margin(128, d)
                       for d in (width, height)]
            c[:] = [np.random.randint(low=m, high=d - m)
                    for m, d in zip(margins, (width, height))]
        else:
            s_wh = np.broadcast_to(
                np.asarray(s, np.float32).ravel(), (2,))
            shift = np.clip(np.random.randn(2) * cfg.shift,
                            -2 * cfg.shift, 2 * cfg.shift)
            c += s_wh * shift
            aug_s = np.clip(np.random.randn() * cfg.scale + 1,
                            1 - cfg.scale, 1 + cfg.scale)
        rot = 0
        if np.random.random() < cfg.aug_rot:
            rot = np.clip(np.random.randn() * cfg.rotate,
                          -2 * cfg.rotate, 2 * cfg.rotate)
        return c, aug_s, rot

    def _joint_flip_perm(self):
        """Left<->right joint permutation derived from flip_idx."""
        perm = np.arange(self.num_joints)
        pairs = np.asarray(self.flip_idx, np.int64)
        perm[pairs[:, 0]], perm[pairs[:, 1]] = pairs[:, 1], pairs[:, 0]
        return perm

    def _flip_anns(self, anns, width):
        """Horizontally mirror every annotation field, vectorized per
        field across all objects (reference semantics:
        generic_dataset.py:289-314, which loops object-by-object)."""
        heads = self.cfg.heads_dict
        if anns:
            boxes = np.array([a["bbox"] for a in anns], np.float64)
            boxes[:, 0] = width - 1 - boxes[:, 0] - boxes[:, 2]
            for a, b in zip(anns, boxes):
                a["bbox"] = b.tolist()

        if "hps" in heads:
            with_kps = [a for a in anns if "keypoints" in a]
            if with_kps:
                kps = np.array([a["keypoints"] for a in with_kps],
                               np.float32).reshape(-1, self.num_joints, 3)
                kps[..., 0] = width - 1 - kps[..., 0]
                kps = kps[:, self._joint_flip_perm()]
                for a, pts in zip(with_kps, kps):
                    a["keypoints"] = pts.reshape(-1).tolist()

        if "rot" in heads:
            # alpha in (-pi, pi]: mirror about the camera axis
            for a in anns:
                if "alpha" in a:
                    sign = 1.0 if a["alpha"] > 0 else -1.0
                    a["alpha"] = sign * np.pi - a["alpha"]

        if "amodel_offset" in heads:
            for a in anns:
                if "amodel_center" in a:
                    a["amodel_center"][0] = width - 1 - a["amodel_center"][0]

        if self.cfg.velocity:
            # 3D velocity is unrecoverable after a 2D flip; invalidate
            for a in anns:
                if "velocity" in a:
                    a["velocity"] = [-10000, -10000, -10000]
        return anns

    def _get_input(self, img, trans_input):
        """(reference: generic_dataset.py:317-327). HWC float32 output."""
        cfg = self.cfg
        inp = cv2.warpAffine(img, trans_input.astype(np.float32),
                             (cfg.input_w, cfg.input_h),
                             flags=cv2.INTER_LINEAR)
        inp = inp.astype(np.float32) / 255.0
        if self.split == "train" and not cfg.no_color_aug:
            inp = color_aug(self._data_rng, inp, self._eig_val,
                            self._eig_vec)
        inp = (inp - self.mean) / self.std
        return inp

    # ------------------------------------------------------------------
    def _init_ret(self, ret):
        """Allocate fixed-capacity targets
        (reference: generic_dataset.py:330-369) plus splat descriptors
        for the on-device heatmap render."""
        cfg = self.cfg
        heads = cfg.heads_dict
        max_objs = self.max_objs * cfg.dense_reg
        ret["ind"] = np.zeros((max_objs,), np.int64)
        ret["cat"] = np.zeros((max_objs,), np.int64)
        ret["mask"] = np.zeros((max_objs,), np.float32)
        # splat descriptors for 'hm'
        ret["hm_cts"] = np.zeros((max_objs, 2), np.int32)
        ret["hm_radii"] = np.zeros((max_objs,), np.int32)
        ret["hm_valid"] = np.zeros((max_objs,), bool)
        # rectangular ignore/crowd regions; cat == -1 -> all classes
        ret["ignore_boxes"] = np.zeros((self.max_ignore_regions, 4),
                                       np.float32)
        ret["ignore_cat"] = np.zeros((self.max_ignore_regions,), np.int32)
        ret["ignore_valid"] = np.zeros((self.max_ignore_regions,), bool)
        self._num_ignore = 0

        regression_head_dims = {
            "reg": 2, "wh": 2, "tracking": 2, "ltrb": 4, "ltrb_amodal": 4,
            "nuscenes_att": 8, "velocity": 3, "hps": self.num_joints * 2,
            "dep": 1, "dim": 3, "amodel_offset": 2}
        for head in regression_head_dims:
            if head in heads:
                ret[head] = np.zeros(
                    (max_objs, regression_head_dims[head]), np.float32)
                ret[head + "_mask"] = np.zeros(
                    (max_objs, regression_head_dims[head]), np.float32)

        if "hm_hp" in heads:
            num_joints = self.num_joints
            ret["hm_hp_cts"] = np.zeros((max_objs * num_joints, 2), np.int32)
            ret["hm_hp_radii"] = np.zeros((max_objs * num_joints,), np.int32)
            ret["hm_hp_joint"] = np.zeros((max_objs * num_joints,), np.int32)
            ret["hm_hp_splat_valid"] = np.zeros((max_objs * num_joints,),
                                                bool)
            # visible-but-unlabeled points force hm_hp[pt] = 1 (ignore_val)
            ret["hm_hp_point_ignore"] = np.zeros((max_objs * num_joints, 2),
                                                 np.int32)
            ret["hm_hp_point_ignore_joint"] = np.zeros(
                (max_objs * num_joints,), np.int32)
            ret["hm_hp_point_ignore_valid"] = np.zeros(
                (max_objs * num_joints,), bool)
            ret["hm_hp_ignore_boxes"] = np.zeros(
                (self.max_ignore_regions, 4), np.float32)
            ret["hm_hp_ignore_joint"] = np.zeros(
                (self.max_ignore_regions,), np.int32)
            ret["hm_hp_ignore_valid"] = np.zeros(
                (self.max_ignore_regions,), bool)
            self._num_hp_ignore = 0
            ret["hm_hp_mask"] = np.zeros((max_objs * num_joints,),
                                         np.float32)
            ret["hp_offset"] = np.zeros((max_objs * num_joints, 2),
                                        np.float32)
            ret["hp_ind"] = np.zeros((max_objs * num_joints,), np.int64)
            ret["hp_offset_mask"] = np.zeros((max_objs * num_joints, 2),
                                             np.float32)
            ret["joint"] = np.zeros((max_objs * num_joints,), np.int64)

        if "rot" in heads:
            ret["rotbin"] = np.zeros((max_objs, 2), np.int64)
            ret["rotres"] = np.zeros((max_objs, 2), np.float32)
            ret["rot_mask"] = np.zeros((max_objs,), np.float32)

    def _get_calib(self, img_info, width, height):
        if "calib" in img_info:
            return np.array(img_info["calib"], np.float32)
        return np.array([[self.rest_focal_length, 0, width / 2, 0],
                         [0, self.rest_focal_length, height / 2, 0],
                         [0, 0, 1, 0]], np.float32)

    def _mask_ignore_or_crowd(self, ret, cls_id, bbox):
        """Record a rectangular ignore region
        (reference: generic_dataset.py:386-398 writes hm=1 directly; we
        record the rect for the device render)."""
        if self._num_ignore >= self.max_ignore_regions:
            return
        i = self._num_ignore
        ret["ignore_boxes"][i] = bbox
        ret["ignore_cat"][i] = -1 if cls_id == 0 else abs(cls_id) - 1
        ret["ignore_valid"][i] = True
        self._num_ignore += 1
        if "hm_hp_ignore_boxes" in ret and cls_id <= 1:
            if self._num_hp_ignore < self.max_ignore_regions:
                j = self._num_hp_ignore
                ret["hm_hp_ignore_boxes"][j] = bbox
                ret["hm_hp_ignore_joint"][j] = -1
                ret["hm_hp_ignore_valid"][j] = True
                self._num_hp_ignore += 1

    def _coco_box_to_bbox(self, box):
        return np.array([box[0], box[1], box[0] + box[2], box[1] + box[3]],
                        np.float32)

    def _transform_bboxes(self, boxes_xywh: np.ndarray,
                          trans_output: np.ndarray):
        """All boxes at once: coco xywh -> output-space (clipped, amodal)
        xyxy envelopes of the 4 warped corners (reference semantics:
        generic_dataset.py:407-421, which loops per box)."""
        cfg = self.cfg
        b = np.asarray(boxes_xywh, np.float32)
        x0y0 = b[:, :2]
        x1y1 = b[:, :2] + b[:, 2:4]
        # (N,4,2) corner rectangle per box
        rect = np.stack([x0y0,
                         np.stack([x0y0[:, 0], x1y1[:, 1]], -1),
                         x1y1,
                         np.stack([x1y1[:, 0], x0y0[:, 1]], -1)], axis=1)
        warped = rect @ trans_output[:, :2].T + trans_output[:, 2]
        amodal = np.concatenate([warped.min(axis=1), warped.max(axis=1)],
                                axis=1).astype(np.float32)
        clipped = amodal.copy()
        clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, cfg.output_w - 1)
        clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, cfg.output_h - 1)
        return clipped, amodal

    def _add_instances(self, ret, anns, trans_output, aug_s, calib,
                       pre_cts=None, track_ids=None):
        """Per-object GT targets, batched across objects (reference
        semantics: generic_dataset.py:372-515, which loops per object).

        Target slot k keeps the annotation's original index (holes stay
        zero-masked); boxes are warped with one batched matmul; the
        dense field writes (cat/wh/ind/reg/ltrb/hm splats) are fancy-
        indexed in one shot; only heads that read heterogeneous ann
        dict fields (kps/rot/depth/...) loop over the few live objects.
        """
        cfg = self.cfg
        heads = cfg.heads_dict
        if not anns:
            return
        cls = np.array([self.cat_ids[a["category_id"]] for a in anns],
                       np.int64)
        crowd = np.array([a.get("iscrowd", 0) > 0 for a in anns], bool)
        known = (cls <= cfg.num_classes) & (cls > -999)
        clipped, amodal = self._transform_bboxes(
            [a["bbox"] for a in anns], trans_output)
        wh = clipped[:, 2:4] - clipped[:, 0:2]  # (N,2) = (w, h)

        # crowd/ignore regions keep their sequential capacity semantics
        for k in np.nonzero(known & ((cls <= 0) | crowd))[0]:
            self._mask_ignore_or_crowd(ret, int(cls[k]), clipped[k])

        live_mask = (known & (cls > 0) & ~crowd &
                     (wh[:, 0] > 0) & (wh[:, 1] > 0))
        live = np.nonzero(live_mask)[0]
        if live.size == 0:
            return
        box = clipped[live]
        ct = (box[:, 0:2] + box[:, 2:4]) / 2
        ct_int = ct.astype(np.int32)
        radii = np.array([max(0, int(gaussian_radius(
            (math.ceil(hh), math.ceil(ww)))))
            for ww, hh in wh[live]], np.int32)

        ret["cat"][live] = cls[live] - 1
        ret["mask"][live] = 1
        if "wh" in ret:
            ret["wh"][live] = wh[live]
            ret["wh_mask"][live] = 1
        ret["ind"][live] = ct_int[:, 1] * cfg.output_w + ct_int[:, 0]
        ret["reg"][live] = ct - ct_int
        ret["reg_mask"][live] = 1
        ret["hm_cts"][live] = ct_int
        ret["hm_radii"][live] = radii
        ret["hm_valid"][live] = True

        if "ltrb" in heads:
            ret["ltrb"][live] = box - np.tile(ct_int, 2)
            ret["ltrb_mask"][live] = 1
        if "ltrb_amodal" in heads:
            ret["ltrb_amodal"][live] = amodal[live] - np.tile(ct_int, 2)
            ret["ltrb_amodal_mask"][live] = 1

        if "tracking" in heads and track_ids:
            pre_ct_of = {tid: pc for tid, pc in zip(track_ids, pre_cts)}
            for i, k in enumerate(live):
                pre_ct = pre_ct_of.get(anns[k].get("track_id"))
                if pre_ct is not None:
                    ret["tracking_mask"][k] = 1
                    ret["tracking"][k] = pre_ct - ct_int[i]

        # heads fed by heterogeneous per-ann dict fields
        for i, k in enumerate(live):
            ann = anns[k]
            if "hps" in heads:
                self._add_hps(ret, k, ann, trans_output, ct_int[i],
                              box[i], wh[live][i, 1], wh[live][i, 0])
            if "rot" in heads:
                self._add_rot(ret, ann, k)
            if "dep" in heads and "depth" in ann:
                ret["dep_mask"][k] = 1
                ret["dep"][k] = ann["depth"] * aug_s
            if "dim" in heads and "dim" in ann:
                ret["dim_mask"][k] = 1
                ret["dim"][k] = ann["dim"]
            if "amodel_offset" in heads and "amodel_center" in ann:
                amodel_center = affine_transform(
                    ann["amodel_center"], trans_output)
                ret["amodel_offset_mask"][k] = 1
                ret["amodel_offset"][k] = amodel_center - ct_int[i]
            if "nuscenes_att" in heads and ann.get("attributes", 0) > 0:
                att = int(ann["attributes"] - 1)
                ret["nuscenes_att"][k][att] = 1
                ret["nuscenes_att_mask"][k][
                    self.nuscenes_att_range[att]] = 1
            if "velocity" in heads and "velocity" in ann and \
                    min(ann["velocity"]) > -1000:
                ret["velocity"][k] = np.array(
                    ann["velocity"], np.float32)[:3]
                ret["velocity_mask"][k] = 1

    def _add_hps(self, ret, k, ann, trans_output, ct_int, bbox, h, w):
        """Keypoint targets for object k, computed for all joints at
        once (reference semantics: generic_dataset.py:517-554, which
        iterates joint-by-joint).

        Joint classes:
          * visible (v>1) and in-bounds  -> full regression + splat;
          * labeled-invisible (v==1), in -> splat peak forced to
            ignore_val, excluded from hp_offset/hm_hp losses;
          * unlabeled (v<=0)             -> the whole object box becomes
            an ignore region in that joint's hm_hp channel.
        """
        cfg = self.cfg
        nj = self.num_joints
        pts = (np.array(ann["keypoints"], np.float32).reshape(nj, 3)
               if "keypoints" in ann else np.zeros((nj, 3), np.float32))
        # one matmul transforms every joint to output coords
        xy = pts[:, :2] @ trans_output[:, :2].T + trans_output[:, 2]
        labeled = pts[:, 2] > 0
        in_bounds = ((xy[:, 0] >= 0) & (xy[:, 0] < cfg.output_w) &
                     (xy[:, 1] >= 0) & (xy[:, 1] < cfg.output_h))
        live = labeled & in_bounds
        invisible = live & (pts[:, 2] == 1)

        sl = slice(k * nj, (k + 1) * nj)  # this object's rows
        xy_int = xy.astype(np.int32)
        ret["hps"][k].reshape(nj, 2)[live] = xy[live] - ct_int
        ret["hps_mask"][k].reshape(nj, 2)[live] = 1
        ret["hp_offset"][sl][live] = xy[live] - xy_int[live]
        ret["hp_ind"][sl][live] = (xy_int[live, 1] * cfg.output_w
                                   + xy_int[live, 0])
        ret["hp_offset_mask"][sl][live & ~invisible] = 1
        ret["hm_hp_mask"][sl][live & ~invisible] = 1
        ret["joint"][sl][live] = np.nonzero(live)[0]
        ret["hm_hp_cts"][sl][live] = xy_int[live]
        radius = max(0, int(gaussian_radius((math.ceil(h), math.ceil(w)))))
        ret["hm_hp_radii"][sl][live] = radius
        ret["hm_hp_joint"][sl][live] = np.nonzero(live)[0]
        ret["hm_hp_splat_valid"][sl][live] = True
        ret["hm_hp_point_ignore"][sl][invisible] = xy_int[invisible]
        ret["hm_hp_point_ignore_joint"][sl][invisible] = \
            np.nonzero(invisible)[0]
        ret["hm_hp_point_ignore_valid"][sl][invisible] = True

        for j in np.nonzero(~labeled)[0]:
            if self._num_hp_ignore >= self.max_ignore_regions:
                break
            i = self._num_hp_ignore
            ret["hm_hp_ignore_boxes"][i] = bbox
            ret["hm_hp_ignore_joint"][i] = j
            ret["hm_hp_ignore_valid"][i] = True
            self._num_hp_ignore += 1

    # Multibin orientation: two overlapping bins centered at -pi/2 and
    # +pi/2, each covering 240 degrees (reference semantics:
    # generic_dataset.py:556-568).
    _ROT_BIN_CENTERS = np.array([-0.5 * np.pi, 0.5 * np.pi])

    def _add_rot(self, ret, ann, k):
        if "alpha" not in ann:
            return
        ret["rot_mask"][k] = 1
        alpha = ann["alpha"]
        in_bin = np.array([
            alpha < np.pi / 6 or alpha > 5 * np.pi / 6,
            alpha > -np.pi / 6 or alpha < -5 * np.pi / 6])
        ret["rotbin"][k] = in_bin
        ret["rotres"][k] = np.where(in_bin,
                                    alpha - self._ROT_BIN_CENTERS, 0.0)

    def fake_video_data(self):
        """Treat each still image as a 1-frame video so the tracking
        pipeline (pre-frame sampling, track ids) works on detection
        datasets (reference semantics: generic_dataset.py:595-607)."""
        data = self.coco.dataset
        for img in data["images"]:
            img["video_id"], img["frame_id"] = img["id"], 1
        data["videos"] = [{"id": img["id"]} for img in data["images"]]
        for t, ann in enumerate(data.get("annotations", []), start=1):
            ann["track_id"] = t
