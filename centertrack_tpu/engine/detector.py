"""Per-frame detection + tracking pipeline (reference: src/lib/detector.py).

TPU-first re-design: ONE jitted device program per frame fuses
  uint8 frame -> affine warp + normalize     (reference: host cv2, :207-239)
  -> pre_hm gaussian render from tracks      (reference: host numpy, :254-290)
  -> backbone + heads forward
  -> sigmoid/depth activations               (:300-308)
  -> optional flip-test averaging            (:311-332)
  -> maxpool-NMS + top-K decode              (decode.py)
and only the (B, K) det arrays come back to host. The previous frame's
normalized tensor stays resident on device across steps
(reference keeps it as self.pre_images, :49,148). Association runs on
host over <=K dets (reference: tracker.py).
"""

from __future__ import annotations

import functools
import math
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from centertrack_tpu.engine.post_process import generic_post_process
from centertrack_tpu.engine.tracker import Tracker
from centertrack_tpu.models.model import create_model, init_model, load_model
from centertrack_tpu.ops.affine import (affine_transform,
                                        get_affine_transform, invert_affine)
from centertrack_tpu.ops.decode import generic_decode, sigmoid_output
from centertrack_tpu.ops.gaussian import gaussian_radius, render_pre_hm
from centertrack_tpu.ops.warp import preprocess_frame, warp_precision_for


def flip_merge(output: Dict[str, jnp.ndarray],
               flip_idx: Tuple[Tuple[int, int], ...]) -> Dict[str, jnp.ndarray]:
    """Average a [normal; flipped] batch-2 output into batch-1
    (reference: detector.py:311-332). NHWC: W is axis 2."""
    average_flips = {"hm", "wh", "dep", "dim"}
    neg_average_flips = {"amodel_offset"}
    single_flips = {"ltrb", "nuscenes_att", "velocity", "ltrb_amodal", "reg",
                    "hp_offset", "rot", "tracking", "pre_hm"}
    out = {}
    for head, v in output.items():
        if head in average_flips:
            out[head] = (v[0:1] + jnp.flip(v[1:2], axis=2)) / 2
        elif head in neg_average_flips:
            flipped = jnp.flip(v[1:2], axis=2)
            flipped = flipped.at[..., 0::2].multiply(-1)
            out[head] = (v[0:1] + flipped) / 2
        elif head in single_flips:
            out[head] = v[0:1]
        elif head == "hps":
            # (reference: model/utils.py:41-50): flip W, negate x offsets,
            # swap left/right joint pairs.
            flipped = jnp.flip(v[1:2], axis=2)
            b, h, w, c = flipped.shape
            f = flipped.reshape(b, h, w, c // 2, 2)
            f = f.at[..., 0].multiply(-1)
            perm = np.arange(c // 2)
            for a, bb in flip_idx:
                perm[a], perm[bb] = perm[bb], perm[a]
            f = f[:, :, :, perm, :].reshape(b, h, w, c)
            out[head] = (v[0:1] + f) / 2
        elif head == "hm_hp":
            # (reference: model/utils.py:33-39)
            flipped = jnp.flip(v[1:2], axis=2)
            perm = np.arange(v.shape[3])
            for a, bb in flip_idx:
                perm[a], perm[bb] = perm[bb], perm[a]
            out[head] = (v[0:1] + flipped[:, :, :, perm]) / 2
        else:
            out[head] = v
    return out


class Detector:
    """(reference: detector.py:24-458)"""

    def __init__(self, cfg, params=None, batch_stats=None,
                 dataset_meta=None):
        self.cfg = cfg
        from centertrack_tpu.ops.dcn import set_local_impl
        set_local_impl(getattr(cfg, "local_impl", "auto"))
        if dataset_meta is None:
            from centertrack_tpu.data.registry import get_dataset_meta
            dataset_meta = get_dataset_meta(cfg.dataset, cfg)
        self.dataset_meta = dataset_meta
        self.mean = np.asarray(dataset_meta.mean, np.float32).reshape(3)
        self.std = np.asarray(dataset_meta.std, np.float32).reshape(3)
        self.rest_focal_length = (dataset_meta.rest_focal_length
                                  if cfg.test_focal_length < 0
                                  else cfg.test_focal_length)
        self.flip_idx = tuple(tuple(p) for p in dataset_meta.flip_idx)

        self.model = create_model(cfg.arch, cfg.heads_dict,
                                  cfg.head_convs_dict, cfg)
        if params is None:
            if cfg.load_model:
                tmpl_p, tmpl_b = init_model(self.model, cfg)
                ckpt = load_model(cfg.load_model, tmpl_p, tmpl_b,
                                  reset_hm=cfg.reset_hm,
                                  reuse_hm=cfg.reuse_hm)
                params, batch_stats = ckpt["params"], ckpt["batch_stats"]
            else:
                params, batch_stats = init_model(self.model, cfg)
        # device_put once — host-numpy checkpoint trees passed to the
        # jitted forward would otherwise be re-uploaded every frame
        # (~79 MB for dla_34)
        self.params = jax.device_put(params)
        self.batch_stats = jax.device_put(
            batch_stats if batch_stats is not None else {})

        self.pre_images = None      # device (B,H,W,3), normalized
        self.pre_image_ori = None
        self.tracker = Tracker(cfg)
        self.cnt = 0
        self.max_tracks = cfg.max_tracks

        self._warp_fn = {}
        self._step_fn = {}

    # ------------------------------------------------------------------
    def _get_warp_fn(self, in_shape, inp_height=None, inp_width=None):
        """Jitted warp program, keyed by (raw shape, network input size).
        ``inp_*`` default to the config resolution (fix_res); keep_res /
        fix_short paths pass their per-image sizes so the device program
        and the post-process inverse affine agree."""
        inp_height = inp_height or self.cfg.input_h
        inp_width = inp_width or self.cfg.input_w
        key = (in_shape, inp_height, inp_width)
        if key not in self._warp_fn:
            cfg = self.cfg
            mean = jnp.asarray(self.mean)
            std = jnp.asarray(self.std)
            flip_test = cfg.flip_test

            wprec = warp_precision_for(cfg)

            @jax.jit
            def warp(frame_u8, inv_trans):
                img = preprocess_frame(frame_u8, inv_trans, inp_height,
                                       inp_width, mean, std,
                                       axis_aligned=True,
                                       precision=wprec)
                if flip_test:
                    img = jnp.concatenate(
                        [img, jnp.flip(img, axis=2)], axis=0)
                return img

            self._warp_fn[key] = warp
        return self._warp_fn[key]

    def _get_step_fn(self, in_shape, inp_height=None, inp_width=None):
        """Build the fused per-frame program for a raw-frame shape and
        network input size."""
        inp_height = inp_height or self.cfg.input_h
        inp_width = inp_width or self.cfg.input_w
        key = (in_shape, inp_height, inp_width)
        if key in self._step_fn:
            return self._step_fn[key]
        cfg = self.cfg
        model = self.model
        flip_idx = self.flip_idx
        use_pre_img = cfg.pre_img and cfg.tracking
        use_pre_hm = cfg.pre_hm and cfg.tracking
        flip_test = cfg.flip_test

        warp = self._get_warp_fn(in_shape, inp_height, inp_width)

        @jax.jit
        def step(params, batch_stats, frame_u8, inv_trans, pre_images,
                 track_cts, track_radii, track_valid):
            images = warp(frame_u8, inv_trans)
            pre_hm = None
            if use_pre_hm:
                hm = render_pre_hm(inp_height, inp_width, track_cts,
                                   track_radii,
                                   jnp.ones_like(track_radii, jnp.float32),
                                   track_valid, compact=True)[None]
                if cfg.zero_pre_hm:
                    hm = hm * 0
                if flip_test:
                    hm = jnp.concatenate([hm, jnp.flip(hm, axis=2)], axis=0)
                pre_hm = hm
            pre_img = pre_images if use_pre_img else None
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images, pre_img, pre_hm, train=False)[-1]
            out = sigmoid_output(out, cfg.depth_scale)
            if flip_test:
                out = flip_merge(out, flip_idx)
            dets = generic_decode(out, cfg.K, cfg.num_classes,
                                  cfg.zero_tracking)
            if cfg.nms and "bboxes" in dets:
                from centertrack_tpu.ops.nms import batched_nms
                keep = batched_nms(dets["bboxes"], dets["scores"],
                                   dets["clses"])
                dets["scores"] = jnp.where(keep, dets["scores"], 0.0)
                # post-process treats rows as score-sorted (prefix cut
                # at out_thresh); suppression zeroed scores mid-array,
                # so restore the invariant on device
                order = jnp.argsort(-dets["scores"], axis=1)
                dets = {
                    k: jnp.take_along_axis(
                        v, order.reshape(
                            order.shape + (1,) * (v.ndim - 2)), axis=1)
                    for k, v in dets.items()}
            return images, dets

        self._step_fn[key] = step
        return step

    # ------------------------------------------------------------------
    def _transform_scale(self, image, scale: float = 1.0):
        """(reference: detector.py:175-204)"""
        cfg = self.cfg
        height, width = image.shape[0:2]
        new_height = int(height * scale)
        new_width = int(width * scale)
        if cfg.fix_short > 0:
            if height < width:
                inp_height = cfg.fix_short
                inp_width = (int(width / height * cfg.fix_short) + 63
                             ) // 64 * 64
            else:
                inp_height = (int(height / width * cfg.fix_short) + 63
                              ) // 64 * 64
                inp_width = cfg.fix_short
            c = np.array([width / 2, height / 2], dtype=np.float32)
            s = np.array([width, height], dtype=np.float32)
        elif cfg.fix_res:
            inp_height, inp_width = cfg.input_h, cfg.input_w
            c = np.array([new_width / 2.0, new_height / 2.0], np.float32)
            s = max(height, width) * 1.0
        else:
            inp_height = (new_height | cfg.pad) + 1
            inp_width = (new_width | cfg.pad) + 1
            c = np.array([new_width // 2, new_height // 2], np.float32)
            s = np.array([inp_width, inp_height], np.float32)
        return c, s, inp_width, inp_height, height, width

    def _get_default_calib(self, width, height):
        return np.array(
            [[self.rest_focal_length, 0, width / 2, 0],
             [0, self.rest_focal_length, height / 2, 0],
             [0, 0, 1, 0]], np.float32)

    def _trans_bbox(self, bbox, trans, width, height):
        """(reference: detector.py:242-251)"""
        bbox = np.array(bbox, dtype=np.float32).copy()
        bbox[:2] = affine_transform(bbox[:2], trans)
        bbox[2:] = affine_transform(bbox[2:], trans)
        bbox[[0, 2]] = np.clip(bbox[[0, 2]], 0, width - 1)
        bbox[[1, 3]] = np.clip(bbox[[1, 3]], 0, height - 1)
        return bbox

    def _track_arrays(self, trans_input, inp_width, inp_height):
        """Fixed-capacity (max_tracks,) arrays describing live tracks for
        the on-device pre_hm render (reference computed the heatmap
        itself on host: detector.py:254-290)."""
        t = self.max_tracks
        cts = np.zeros((t, 2), np.int32)
        radii = np.zeros((t,), np.int32)
        valid = np.zeros((t,), bool)
        n = 0
        for det in self.tracker.tracks:
            if det["score"] < self.cfg.pre_thresh or det["active"] == 0:
                continue
            bbox = self._trans_bbox(det["bbox"], trans_input, inp_width,
                                    inp_height)
            h, w = bbox[3] - bbox[1], bbox[2] - bbox[0]
            if h > 0 and w > 0 and n < t:
                radius = gaussian_radius((math.ceil(h), math.ceil(w)))
                ct = np.array([(bbox[0] + bbox[2]) / 2,
                               (bbox[1] + bbox[3]) / 2], np.float32)
                cts[n] = ct.astype(np.int32)
                radii[n] = max(0, int(radius))
                valid[n] = True
                n += 1
        return cts, radii, valid

    # ------------------------------------------------------------------
    def run(self, image_or_path, meta: Optional[Dict] = None) -> Dict:
        """Process one frame (reference: detector.py:55-172)."""
        cfg = self.cfg
        meta = dict(meta or {})
        start = time.time()
        if isinstance(image_or_path, str):
            import cv2
            image = cv2.imread(image_or_path)
        else:
            image = image_or_path
        load_time = time.time() - start

        scale = cfg.test_scales[0]
        assert len(cfg.test_scales) == 1, "multi_scale not supported!"

        t0 = time.time()
        c, s, inp_width, inp_height, height, width = \
            self._transform_scale(image, scale)
        trans_input = get_affine_transform(
            c, s, 0, [inp_width, inp_height])
        out_height = inp_height // cfg.down_ratio
        out_width = inp_width // cfg.down_ratio
        trans_output = get_affine_transform(
            c, s, 0, [out_width, out_height])
        inv_trans_input = invert_affine(trans_input).astype(np.float32)

        calib = (np.array(meta["calib"], np.float32)
                 if "calib" in meta
                 else self._get_default_calib(width, height))

        in_shape = image.shape
        step = self._get_step_fn(in_shape, inp_height, inp_width)
        frame_dev = jnp.asarray(image)

        # tracking state
        if cfg.tracking and self.pre_images is None:
            warp = self._get_warp_fn(in_shape, inp_height, inp_width)
            self.pre_images = warp(frame_dev, jnp.asarray(inv_trans_input))
            self.tracker.init_track(meta.get("pre_dets", []))
        track_cts, track_radii, track_valid = self._track_arrays(
            trans_input, inp_width, inp_height)
        pre_time = time.time() - t0

        t0 = time.time()
        pre_images = (self.pre_images if self.pre_images is not None
                      else jnp.zeros(
                          (2 if cfg.flip_test else 1, inp_height,
                           inp_width, 3), jnp.float32))
        if cfg.tracking and self.pre_images is not None and \
                tuple(self.pre_images.shape[1:3]) != (inp_height, inp_width):
            # keep_res sizes vary per image; the temporal model needs a
            # constant resolution within one tracked sequence
            raise ValueError(
                "input resolution changed mid-sequence "
                f"({tuple(self.pre_images.shape[1:3])} -> "
                f"{(inp_height, inp_width)}); call reset_tracking() at "
                "video boundaries or use fix_res")
        images, dets_dev = step(
            self.params, self.batch_stats, frame_dev,
            jnp.asarray(inv_trans_input), pre_images,
            jnp.asarray(track_cts), jnp.asarray(track_radii),
            jnp.asarray(track_valid))
        dets = {k: np.asarray(v) for k, v in dets_dev.items()}
        net_time = time.time() - t0

        t0 = time.time()
        result = generic_post_process(
            cfg, dets, [c], [s], out_height, out_width, [calib])
        results = [d for d in result[0] if d["score"] > cfg.out_thresh]
        post_time = time.time() - t0

        t0 = time.time()
        if cfg.tracking:
            public_det = meta.get("cur_dets") if cfg.public_det else None
            results = self.tracker.step(results, public_det)
            self.pre_images = images
        track_time = time.time() - t0

        self.cnt += 1
        return {
            "results": results,
            "tot": time.time() - start, "load": load_time,
            "pre": pre_time, "net": net_time, "post": post_time,
            "track": track_time,
        }

    def show_results(self, image, results, save_dir: str = "debug_out",
                     prefix: str = "") -> None:
        """Render detections/tracks with the Debugger
        (reference: detector.py:402-452). Headless: writes PNGs."""
        from centertrack_tpu.utils.debugger import Debugger
        debugger = Debugger(cfg=self.cfg, dataset=self.dataset_meta)
        debugger.add_img(image, img_id="generic")
        for item in results:
            if item["score"] > self.cfg.vis_thresh:
                if item.get("active", 1) == 0:
                    continue
                if "bbox" in item:
                    debugger.add_coco_bbox(
                        item["bbox"], item["class"] - 1, item["score"],
                        img_id="generic")
                if "tracking" in item:
                    debugger.add_arrow(item["ct"], item["tracking"],
                                       img_id="generic")
                if "tracking_id" in item:
                    debugger.add_tracking_id(
                        item["ct"], item["tracking_id"], img_id="generic")
                if item["class"] in (1, 2) and "hps" in item:
                    debugger.add_coco_hp(item["hps"], img_id="generic")
        if results and "dep" in results[0] and "alpha" in results[0] \
                and "dim" in results[0]:
            calib = self._get_default_calib(image.shape[1],
                                            image.shape[0])
            debugger.add_3d_detection(
                image, False, results, calib,
                vis_thresh=self.cfg.vis_thresh, img_id="ddd_pred")
            debugger.add_bird_view(
                results, vis_thresh=self.cfg.vis_thresh,
                img_id="bird_pred", cnt=self.cnt)
        debugger.save_all_imgs(save_dir, prefix=prefix or str(self.cnt))

    def reset_tracking(self) -> None:
        """(reference: detector.py:455-458)"""
        self.tracker.reset()
        self.pre_images = None
        self.pre_image_ori = None
