"""Fully-fused detection+tracking pipeline: ZERO per-frame host sync.

The standard Detector (engine/detector.py) mirrors the reference's loop
structure: decode results come back to the host every frame for
post-processing and association (reference: detector.py:143-148). On a
TPU behind an RPC tunnel that per-frame device->host round trip costs
more than the network itself.

FusedDetector moves the ENTIRE per-frame loop into one jitted device
program:

  uint8 frame -> affine warp + normalize
              -> pre_hm render FROM DEVICE TRACK STATE
                 (bbox -> input coords -> radius law -> gaussian splat)
              -> backbone + heads -> decode (top-K)
              -> device post-process (inverse affine to image coords)
              -> device greedy association (engine/device_tracker.py)
              -> new track state

Track state and the previous frame tensor never leave HBM; the host
only enqueues frames and *lazily* fetches per-frame result arrays, so
frames pipeline at full hardware throughput and result readback
overlaps the next frames' compute.

Beyond 2D tracking, the packed result row extends per-task:
  - ddd (tracking,ddd): the 3D lift runs ON DEVICE — alpha from the
    8-bin rot head, amodal center, unprojection through the calib to
    (loc, rot_y) (same math as engine/post_process.py:86-99 /
    utils/ddd.py:71-89; reference: src/lib/utils/post_process.py:65-77)
    — and dep/alpha/dim/loc/rot_y/amodel_ct ride the same single
    packed transfer.
  - multi_pose (tracking,multi_pose): hm_hp-snapped keypoints are
    warped to image coordinates on device and packed (+kps_score).
Use fetch_full()/fetch_chunk_full() to materialize the task-extended
dicts; the static fetch()/fetch_chunk() parse the 2D-tracking prefix
(columns 0-12), which is layout-stable across tasks.

Private-detection tracking only (public-det mode and multi-scale stay
on the host Detector).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from centertrack_tpu.engine import device_tracker as dt
from centertrack_tpu.models.model import create_model, init_model, load_model
from centertrack_tpu.ops.affine import get_affine_transform, invert_affine
from centertrack_tpu.ops.decode import generic_decode, sigmoid_output
from centertrack_tpu.ops.gaussian import (gaussian_radius_jax,
                                          render_pre_hm)
from centertrack_tpu.ops.warp import preprocess_frame, warp_precision_for


def _affine_pts(pts: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """(N, 2) points through a 2x3 affine."""
    return pts @ m[:, :2].T + m[:, 2]


def _extras_spec(cfg):
    """Packed-row layout beyond the 13 base columns, derived from the
    task's head dict: [(name, width), ...]. Mirrors the host
    post-process's per-task output fields (engine/post_process.py)."""
    heads = cfg.heads_dict
    spec = []
    if {"dep", "rot", "dim"} <= set(heads):
        spec += [("dep", 1), ("alpha", 1), ("dim", 3), ("loc", 3),
                 ("rot_y", 1), ("amodel_ct", 2)]
    if "hps" in heads:
        spec += [("hps", heads["hps"]), ("kps_score", 1)]
    return spec


def _device_extras(cfg, dets, bb, inv_trans_output, calib):
    """Per-task extra result columns, computed on device inside the
    jitted step. Returns a list of (K, w) fp32 arrays matching
    _extras_spec(cfg). `dets` holds UNBATCHED (K, ...) decode outputs;
    `bb` is the (K, 4) OUTPUT-GRID bbox (pre-warp); `calib` a (3, 4)
    camera matrix in original-image coordinates."""
    heads = cfg.heads_dict
    cols = []
    if {"dep", "rot", "dim"} <= set(heads):
        dep = dets["dep"][:, 0].astype(jnp.float32)
        rot = dets["rot"].astype(jnp.float32)
        dim = dets["dim"].astype(jnp.float32)
        # 8-bin rot -> alpha (engine/post_process.py:31-37;
        # reference: post_process.py:12-19)
        idx = rot[:, 1] > rot[:, 5]
        alpha1 = jnp.arctan2(rot[:, 2], rot[:, 3]) - 0.5 * jnp.pi
        alpha2 = jnp.arctan2(rot[:, 6], rot[:, 7]) + 0.5 * jnp.pi
        alpha = jnp.where(idx, alpha1, alpha2)
        # 3D lift at the amodal center when predicted, else bbox center
        # (reference: post_process.py:65-77)
        bbox_ct = (bb[:, 0:2] + bb[:, 2:4]) / 2
        if "amodel_offset" in heads:
            bbox_ct = bbox_ct + dets["amodel_offset"]
        ct3d = _affine_pts(bbox_ct, inv_trans_output)
        # unproject + yaw (utils/ddd.py:71-89, jnp re-expression)
        z = dep - calib[2, 3]
        x3 = (ct3d[:, 0] * dep - calib[0, 3] - calib[0, 2] * z) \
            / calib[0, 0]
        y3 = (ct3d[:, 1] * dep - calib[1, 3] - calib[1, 2] * z) \
            / calib[1, 1] + dim[:, 0] / 2
        rot_y = alpha + jnp.arctan2(ct3d[:, 0] - calib[0, 2],
                                    calib[0, 0])
        rot_y = jnp.where(rot_y > jnp.pi, rot_y - 2 * jnp.pi, rot_y)
        rot_y = jnp.where(rot_y < -jnp.pi, rot_y + 2 * jnp.pi, rot_y)
        cols += [dep[:, None], alpha[:, None], dim,
                 jnp.stack([x3, y3, z], axis=1), rot_y[:, None], ct3d]
    if "hps" in heads:
        j2 = heads["hps"]
        kps = dets["hps"].astype(jnp.float32)  # (K, 2J) grid coords
        k = kps.shape[0]
        kps_img = _affine_pts(kps.reshape(k * (j2 // 2), 2),
                              inv_trans_output).reshape(k, j2)
        cols += [kps_img, dets["kps_score"].astype(jnp.float32)
                 [:, None]]
    return cols


class FusedDetector:
    def __init__(self, cfg, params=None, batch_stats=None,
                 dataset_meta=None):
        assert cfg.tracking, "FusedDetector is for tracking tasks"
        self.cfg = cfg
        from centertrack_tpu.ops.dcn import set_local_impl
        set_local_impl(getattr(cfg, "local_impl", "auto"))
        if dataset_meta is None:
            from centertrack_tpu.data.registry import get_dataset_meta
            dataset_meta = get_dataset_meta(cfg.dataset, cfg)
        self.mean = jnp.asarray(
            np.asarray(dataset_meta.mean, np.float32).reshape(3))
        self.std = jnp.asarray(
            np.asarray(dataset_meta.std, np.float32).reshape(3))
        self.model = create_model(cfg.arch, cfg.heads_dict,
                                  cfg.head_convs_dict, cfg)
        if params is None:
            if cfg.load_model:
                tp, tb = init_model(self.model, cfg)
                ckpt = load_model(cfg.load_model, tp, tb)
                params, batch_stats = ckpt["params"], ckpt["batch_stats"]
            else:
                params, batch_stats = init_model(self.model, cfg)
        # device_put once: host-numpy trees (e.g. loaded checkpoints)
        # passed straight to the jitted step would be re-uploaded EVERY
        # frame (~79 MB/frame for dla_34 — 1.5 s through the dev
        # tunnel's 54 MB/s H2D; a real-chip PCIe cost too)
        self.params = jax.device_put(params)
        self.batch_stats = jax.device_put(batch_stats or {})
        self.capacity = cfg.max_tracks
        self._step = {}
        self._chunk = {}
        self._warp = {}
        self._trans = {}
        # per-task extra packed columns (ddd 3D lift / pose keypoints)
        self._extras = _extras_spec(cfg)
        self.rest_focal_length = (dataset_meta.rest_focal_length
                                  if cfg.test_focal_length < 0
                                  else cfg.test_focal_length)
        self._calib = None       # host (3,4) override, else default
        self._calib_dev = {}     # device copies per frame shape
        self.reset_tracking()

    def set_calib(self, calib):
        """Install the camera matrix (3, 4) used by the on-device ddd
        lift (original-image pixel coordinates). Without a call, the
        reference's default calib is built from rest_focal_length and
        the frame size (engine/detector.py:_get_default_calib)."""
        self._calib = (None if calib is None
                       else np.asarray(calib, np.float32).reshape(3, 4))
        self._calib_dev = {}

    def _calib_for(self, height, width):
        key = (height, width)
        dev = self._calib_dev.get(key)
        if dev is None:
            c = self._calib
            if c is None:
                f = float(self.rest_focal_length)
                c = np.array([[f, 0, width / 2, 0],
                              [0, f, height / 2, 0],
                              [0, 0, 1, 0]], np.float32)
            dev = jnp.asarray(c)
            self._calib_dev[key] = dev
        return dev

    def reset_tracking(self):
        self.track_state = dt.init_state(self.capacity)
        self.pre_images = None

    # ------------------------------------------------------------------
    def _build(self, in_shape):
        cfg = self.cfg
        model = self.model
        mean, std = self.mean, self.std
        k = cfg.K

        wprec = warp_precision_for(cfg)

        @jax.jit
        def warp(frame_u8, inv_trans):
            return preprocess_frame(frame_u8, inv_trans, cfg.input_h,
                                    cfg.input_w, mean, std,
                                    axis_aligned=True, precision=wprec)

        def one_frame(params, batch_stats, frame_u8, inv_trans_input,
                      trans_input, inv_trans_output, calib, pre_images,
                      state):
            images = warp(frame_u8, inv_trans_input)

            # ---- pre_hm from device track state --------------------
            use_track = (state.valid & (state.active > 0) &
                         (state.scores >= cfg.pre_thresh))
            tl = _affine_pts(state.bboxes[:, 0:2], trans_input)
            br = _affine_pts(state.bboxes[:, 2:4], trans_input)
            x1 = jnp.clip(tl[:, 0], 0, cfg.input_w - 1)
            y1 = jnp.clip(tl[:, 1], 0, cfg.input_h - 1)
            x2 = jnp.clip(br[:, 0], 0, cfg.input_w - 1)
            y2 = jnp.clip(br[:, 1], 0, cfg.input_h - 1)
            h = y2 - y1
            w = x2 - x1
            use_track = use_track & (h > 0) & (w > 0)
            radius = jnp.maximum(0, jnp.floor(gaussian_radius_jax(
                jnp.ceil(h), jnp.ceil(w)))).astype(jnp.int32)
            cts = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2], axis=1)
            pre_hm = render_pre_hm(
                cfg.input_h, cfg.input_w, cts.astype(jnp.int32), radius,
                jnp.ones_like(radius, jnp.float32), use_track,
                compact=True)[None]
            if cfg.zero_pre_hm:
                pre_hm = pre_hm * 0

            # ---- net + decode --------------------------------------
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images, pre_images if cfg.pre_img else None,
                pre_hm if cfg.pre_hm else None, train=False)[-1]
            out = sigmoid_output(out, cfg.depth_scale)
            dets = generic_decode(out, k, cfg.num_classes,
                                  cfg.zero_tracking)

            # ---- device post-process (output grid -> image) --------
            scores = dets["scores"][0]
            clses = dets["clses"][0].astype(jnp.int32) + 1
            cts_out = dets["cts"][0]
            cts_img = _affine_pts(cts_out, inv_trans_output)
            tracking_img = _affine_pts(
                dets["tracking"][0] + cts_out, inv_trans_output) - cts_img
            bb = dets["bboxes"][0]
            p1 = _affine_pts(bb[:, 0:2], inv_trans_output)
            p2 = _affine_pts(bb[:, 2:4], inv_trans_output)
            bboxes_img = jnp.concatenate([p1, p2], axis=1)

            # ---- device association --------------------------------
            new_state, assoc = dt.step(
                state, scores, clses, cts_img, tracking_img, bboxes_img,
                cfg.out_thresh, cfg.new_thresh, cfg.max_age)
            extras = _device_extras(
                cfg, jax.tree_util.tree_map(lambda a: a[0], dets), bb,
                inv_trans_output, calib)
            results = _pack_results(scores, clses, cts_img,
                                    tracking_img, bboxes_img, assoc,
                                    extras)
            return images, new_state, results

        step = jax.jit(one_frame)

        @jax.jit
        def chunk(params, batch_stats, frames_u8, inv_trans_input,
                  trans_input, inv_trans_output, calib, pre_images,
                  state):
            # lax.scan over the time axis: ONE dispatch RPC advances F
            # frames, carrying (pre_images, track_state) in HBM. Per
            # frame this runs the exact one_frame program — the win is
            # purely amortized dispatch latency (the S=1 pipeline is
            # latency-bound at 42% of the memory roof, docs/PERF.md).
            def body(carry, frame_u8):
                pre_images, state = carry
                images, new_state, results = one_frame(
                    params, batch_stats, frame_u8, inv_trans_input,
                    trans_input, inv_trans_output, calib, pre_images,
                    state)
                return (images, new_state), results

            (pre_images, state), results = jax.lax.scan(
                body, (pre_images, state), frames_u8)
            return pre_images, state, results

        self._warp[in_shape] = warp
        self._step[in_shape] = step
        self._chunk[in_shape] = chunk
        return step

    # ------------------------------------------------------------------
    def _transforms(self, height, width):
        """Device-resident (inv_trans_input, trans_input,
        inv_trans_output) for a frame size. The transforms are a pure
        function of (H, W, cfg) — uploading them per frame costs 3 H2D
        RPCs through the axon tunnel per run(), which is pure dispatch
        latency at S=1. Cached once per shape instead."""
        key = (height, width)
        cached = self._trans.get(key)
        if cached is not None:
            return cached
        cfg = self.cfg
        c = np.array([width / 2.0, height / 2.0], np.float32)
        s = max(height, width) * 1.0
        trans_input = get_affine_transform(
            c, s, 0, [cfg.input_w, cfg.input_h])
        inv_trans_input = invert_affine(trans_input).astype(np.float32)
        out_w, out_h = cfg.input_w // cfg.down_ratio, \
            cfg.input_h // cfg.down_ratio
        inv_trans_output = get_affine_transform(
            c, s, 0, [out_w, out_h], inv=1).astype(np.float32)
        cached = (jnp.asarray(inv_trans_input),
                  jnp.asarray(trans_input.astype(np.float32)),
                  jnp.asarray(inv_trans_output))
        self._trans[key] = cached
        return cached

    def run(self, image) -> jnp.ndarray:
        """Enqueue one frame; returns the LAZY packed (K, 13) result
        matrix (pass to fetch() to materialize — ideally a frame
        later). `image` may be a host uint8 array or an already
        device-resident one (e.g. staged ahead to overlap the H2D
        transfer with compute)."""
        height, width = image.shape[:2]
        inv_trans_input, trans_input, inv_trans_output = \
            self._transforms(height, width)

        in_shape = image.shape
        step = self._step.get(in_shape) or self._build(in_shape)
        frame = jnp.asarray(image)
        if self.pre_images is None:
            self.pre_images = self._warp[in_shape](
                frame, inv_trans_input)
        images, self.track_state, results = step(
            self.params, self.batch_stats, frame,
            inv_trans_input, trans_input, inv_trans_output,
            self._calib_for(height, width),
            self.pre_images, self.track_state)
        self.pre_images = images
        try:
            # start the D2H transfer now so a lag-1 fetch() finds the
            # bytes already on host instead of paying the tunnel
            # round-trip latency synchronously
            results.copy_to_host_async()
        except Exception:
            pass
        return results

    def run_chunk(self, frames) -> jnp.ndarray:
        """Advance the tracker over F consecutive frames with ONE
        device dispatch (lax.scan over time, carrying pre_images +
        track state in HBM) and return the lazy packed (F, K, 13)
        result matrix — every frame's results, identical math to F
        run() calls. At S=1 the pipeline is dispatch-latency-bound
        (docs/PERF.md), so amortizing the per-step RPC over F frames
        raises throughput while results still stream out within F
        frames of capture — the same delay window as the lag-4 async
        fetch the per-frame mode already needs. `frames` is a stacked
        (F, H, W, 3) uint8 array or a list of same-shaped frames (host
        or device)."""
        if isinstance(frames, (list, tuple)):
            frames = jnp.stack([jnp.asarray(f) for f in frames])
        else:
            frames = jnp.asarray(frames)
        height, width = frames.shape[1:3]
        inv_trans_input, trans_input, inv_trans_output = \
            self._transforms(height, width)
        in_shape = tuple(frames.shape[1:])
        if in_shape not in self._chunk:
            self._build(in_shape)
        chunk = self._chunk[in_shape]
        if self.pre_images is None:
            self.pre_images = self._warp[in_shape](
                frames[0], inv_trans_input)
        self.pre_images, self.track_state, results = chunk(
            self.params, self.batch_stats, frames,
            inv_trans_input, trans_input, inv_trans_output,
            self._calib_for(height, width),
            self.pre_images, self.track_state)
        try:
            results.copy_to_host_async()
        except Exception:
            pass
        return results

    @staticmethod
    def fetch_chunk(results: jnp.ndarray,
                    out_thresh: float) -> List[List[Dict]]:
        """Materialize a run_chunk result into per-frame dict-lists
        with ONE device->host transfer of the packed (F, K, C) matrix
        (per-frame fetches would cost F tunnel round trips). Parses the
        2D-tracking columns only; use fetch_chunk_full for ddd/pose."""
        host = np.asarray(results)
        return [_fetch_one(host[f], out_thresh)
                for f in range(len(host))]

    @staticmethod
    def fetch(results: jnp.ndarray, out_thresh: float) -> List[Dict]:
        """Materialize lazy per-frame results into the host dict-list
        format the datasets' save_results expect. One np.asarray on the
        packed (K, C) matrix = ONE device->host transfer; a per-field
        dict would cost 8 RPC round trips through the axon tunnel.
        Parses the 2D-tracking columns only; use fetch_full for the
        task-extended dicts (ddd/pose)."""
        return _fetch_one(np.asarray(results), out_thresh)

    def fetch_full(self, results: jnp.ndarray,
                   out_thresh: float) -> List[Dict]:
        """fetch() plus this task's extra fields (ddd: dep/alpha/dim/
        loc/rot_y + amodal ct; pose: hps/kps_score) — same single
        packed transfer, columns parsed by the engine's layout."""
        return _fetch_one(np.asarray(results), out_thresh,
                          self._extras)

    def fetch_chunk_full(self, results: jnp.ndarray,
                         out_thresh: float) -> List[List[Dict]]:
        host = np.asarray(results)
        return [_fetch_one(host[f], out_thresh, self._extras)
                for f in range(len(host))]


# Packed per-candidate result row (fp32): [score, class, ct_x, ct_y,
# track_dx, track_dy, x1, y1, x2, y2, tracking_id, age, active], then
# per-task extra columns (_extras_spec). fp32 holds ids/ages/classes
# exactly up to 2^24.
_PACK_COLS = 13


def _pack_results(scores, clses, cts_img, tracking_img, bboxes_img,
                  assoc, extras=()):
    f32 = lambda a: a.astype(jnp.float32)[..., None]
    return jnp.concatenate(
        [scores[..., None], f32(clses), cts_img, tracking_img,
         bboxes_img, f32(assoc["tracking_id"]), f32(assoc["age"]),
         f32(assoc["active"])] + list(extras), axis=-1)


def _fetch_one(packed: np.ndarray, out_thresh: float,
               extras=()) -> List[Dict]:
    # vectorized filter (not a sorted-prefix break): robust to any
    # future score-mutating step between decode and fetch breaking the
    # sort order. The K-row Python loop this replaces cost ~1 ms/frame
    # on the single host core — real fps at 60+ fps frame rates.
    keep = packed[(packed[:, 0] > out_thresh) & (packed[:, 10] > 0)]
    out = []
    for row in keep:
        item = {
            "score": float(row[0]),
            "class": int(row[1]),
            "ct": row[2:4],
            "tracking": row[4:6],
            "bbox": row[6:10],
            "tracking_id": int(row[10]),
            "age": int(row[11]),
            "active": int(row[12]),
        }
        col = _PACK_COLS
        for name, width in extras:
            item[name] = (float(row[col]) if width == 1
                          else row[col:col + width])
            col += width
        if "amodel_ct" in item:
            # ddd dict contract: 'ct' is the amodal center in image
            # coordinates (engine/post_process.py:92-94; reference:
            # post_process.py:65-70)
            item["ct"] = item.pop("amodel_ct")
        out.append(item)
    return out


class MultiStreamDetector:
    """Tracks S independent video streams in ONE batched device program.

    B=1 inference leaves the TPU's MXU almost entirely idle (the r2
    headline ran at ~2% MFU); batching S streams through the same
    warp -> pre_hm -> network -> decode -> association pipeline converts
    that idle matmul capacity into aggregate throughput — the TPU
    equivalent of the reference's DataLoader-prefetch throughput mode
    (reference: src/test.py:53-130), but with S concurrent sequences
    instead of pipelined pre-processing.

    Semantics per stream are IDENTICAL to FusedDetector: track state is
    a capacity-T array pytree with a leading stream axis, associated by
    a vmapped device_tracker.step; streams never interact.

    Typical use: sharded offline eval (one video per stream) or serving
    many cameras from one chip.
    """

    def __init__(self, cfg, streams: int, params=None, batch_stats=None,
                 dataset_meta=None):
        assert cfg.tracking, "MultiStreamDetector is for tracking tasks"
        self.cfg = cfg
        from centertrack_tpu.ops.dcn import set_local_impl
        set_local_impl(getattr(cfg, "local_impl", "auto"))
        self.streams = int(streams)
        if dataset_meta is None:
            from centertrack_tpu.data.registry import get_dataset_meta
            dataset_meta = get_dataset_meta(cfg.dataset, cfg)
        self.mean = jnp.asarray(
            np.asarray(dataset_meta.mean, np.float32).reshape(3))
        self.std = jnp.asarray(
            np.asarray(dataset_meta.std, np.float32).reshape(3))
        self.model = create_model(cfg.arch, cfg.heads_dict,
                                  cfg.head_convs_dict, cfg)
        if params is None:
            if cfg.load_model:
                tp, tb = init_model(self.model, cfg)
                ckpt = load_model(cfg.load_model, tp, tb)
                params, batch_stats = ckpt["params"], ckpt["batch_stats"]
            else:
                params, batch_stats = init_model(self.model, cfg)
        # device_put once: host-numpy trees (e.g. loaded checkpoints)
        # passed straight to the jitted step would be re-uploaded EVERY
        # frame (~79 MB/frame for dla_34 — 1.5 s through the dev
        # tunnel's 54 MB/s H2D; a real-chip PCIe cost too)
        self.params = jax.device_put(params)
        self.batch_stats = jax.device_put(batch_stats or {})
        self.capacity = cfg.max_tracks
        self._step = {}
        self._trans = {}
        self._extras = _extras_spec(cfg)
        self.rest_focal_length = (dataset_meta.rest_focal_length
                                  if cfg.test_focal_length < 0
                                  else cfg.test_focal_length)
        self._calib = None       # one (3,4) camera for all streams
        self._calib_dev = {}
        self.reset_tracking()

    def set_calib(self, calib):
        """Camera matrix for the on-device ddd lift, shared by all
        streams (per-stream calib: run one FusedDetector each)."""
        self._calib = (None if calib is None
                       else np.asarray(calib, np.float32).reshape(3, 4))
        self._calib_dev = {}

    def _calib_for(self, height, width):
        key = (height, width)
        dev = self._calib_dev.get(key)
        if dev is None:
            c = self._calib
            if c is None:
                f = float(self.rest_focal_length)
                c = np.array([[f, 0, width / 2, 0],
                              [0, f, height / 2, 0],
                              [0, 0, 1, 0]], np.float32)
            dev = jnp.asarray(
                np.broadcast_to(c, (self.streams, 3, 4)))
            self._calib_dev[key] = dev
        return dev

    # -- state management ---------------------------------------------
    def reset_tracking(self):
        single = dt.init_state(self.capacity)
        self.track_state = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (self.streams,) + a.shape),
            single)
        self.pre_images = None
        self._fresh = np.ones((self.streams,), bool)

    def reset_stream(self, i: int):
        """Reset one stream's tracks (video boundary,
        reference: test.py:90-100 -> detector.reset_tracking)."""
        single = dt.init_state(self.capacity)
        self.track_state = jax.tree_util.tree_map(
            lambda a, z: a.at[i].set(z), self.track_state, single)
        # rebind (never mutate in place): on the CPU backend
        # jnp.asarray() zero-copies host buffers, so an in-place write
        # would race with any still-executing step that read _fresh
        self._fresh = self._fresh.copy()
        self._fresh[i] = True

    # ------------------------------------------------------------------
    def _build(self, in_shape):
        cfg = self.cfg
        model = self.model
        mean, std = self.mean, self.std
        k = cfg.K

        wprec = warp_precision_for(cfg)

        def warp_one(frame_u8, inv_trans):
            return preprocess_frame(frame_u8, inv_trans, cfg.input_h,
                                    cfg.input_w, mean, std,
                                    axis_aligned=True,
                                    precision=wprec)[0]

        def prehm_one(state, trans_input):
            use_track = (state.valid & (state.active > 0) &
                         (state.scores >= cfg.pre_thresh))
            tl = _affine_pts(state.bboxes[:, 0:2], trans_input)
            br = _affine_pts(state.bboxes[:, 2:4], trans_input)
            x1 = jnp.clip(tl[:, 0], 0, cfg.input_w - 1)
            y1 = jnp.clip(tl[:, 1], 0, cfg.input_h - 1)
            x2 = jnp.clip(br[:, 0], 0, cfg.input_w - 1)
            y2 = jnp.clip(br[:, 1], 0, cfg.input_h - 1)
            h = y2 - y1
            w = x2 - x1
            use_track = use_track & (h > 0) & (w > 0)
            radius = jnp.maximum(0, jnp.floor(gaussian_radius_jax(
                jnp.ceil(h), jnp.ceil(w)))).astype(jnp.int32)
            cts = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2], axis=1)
            return render_pre_hm(
                cfg.input_h, cfg.input_w, cts.astype(jnp.int32), radius,
                jnp.ones_like(radius, jnp.float32), use_track,
                compact=True)

        def post_one(dets, inv_trans_output, calib):
            scores = dets["scores"]
            clses = dets["clses"].astype(jnp.int32) + 1
            cts_out = dets["cts"]
            cts_img = _affine_pts(cts_out, inv_trans_output)
            tracking_img = _affine_pts(
                dets["tracking"] + cts_out, inv_trans_output) - cts_img
            bb = dets["bboxes"]
            p1 = _affine_pts(bb[:, 0:2], inv_trans_output)
            p2 = _affine_pts(bb[:, 2:4], inv_trans_output)
            bboxes_img = jnp.concatenate([p1, p2], axis=1)
            extras = _device_extras(cfg, dets, bb, inv_trans_output,
                                    calib)
            return (scores, clses, cts_img, tracking_img, bboxes_img,
                    tuple(extras))

        def assoc_one(state, scores, clses, cts_img, tracking_img,
                      bboxes_img):
            return dt.step(state, scores, clses, cts_img, tracking_img,
                           bboxes_img, cfg.out_thresh, cfg.new_thresh,
                           cfg.max_age)

        @jax.jit
        def step(params, batch_stats, frames_u8, inv_trans_input,
                 trans_input, inv_trans_output, calib, fresh,
                 pre_images, state):
            images = jax.vmap(warp_one)(frames_u8, inv_trans_input)
            # fresh streams condition on the current frame (the
            # single-stream engine does the same on its first frame)
            pre_in = jnp.where(fresh[:, None, None, None], images,
                               pre_images)
            pre_hm = jax.vmap(prehm_one)(state, trans_input)
            if cfg.zero_pre_hm:
                pre_hm = pre_hm * 0
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images, pre_in if cfg.pre_img else None,
                pre_hm if cfg.pre_hm else None, train=False)[-1]
            out = sigmoid_output(out, cfg.depth_scale)
            dets = generic_decode(out, k, cfg.num_classes,
                                  cfg.zero_tracking)
            (scores, clses, cts_img, tracking_img, bboxes_img,
             extras) = jax.vmap(post_one)(dets, inv_trans_output, calib)
            new_state, assoc = jax.vmap(assoc_one)(
                state, scores, clses, cts_img, tracking_img, bboxes_img)
            results = _pack_results(scores, clses, cts_img,
                                    tracking_img, bboxes_img, assoc,
                                    extras)
            return images, new_state, results

        self._step[in_shape] = step
        return step

    # ------------------------------------------------------------------
    def run(self, images) -> jnp.ndarray:
        """Advance every stream by one frame. `images` is a sequence of
        S same-shaped uint8 frames (host or device) or a stacked
        (S, H, W, 3) array. Returns the lazy packed (S, K, 13) result
        matrix (see fetch_stream / fetch_all)."""
        cfg = self.cfg
        if isinstance(images, (list, tuple)):
            first = images[0]
        else:
            first = images[0] if images.ndim == 4 else images
        height, width = first.shape[:2]
        key = (height, width)
        cached = self._trans.get(key)
        if cached is None:
            # transforms are a pure function of (H, W, cfg): build the
            # tiled device copies once per shape (3 fewer H2D RPCs per
            # run through the axon tunnel)
            c = np.array([width / 2.0, height / 2.0], np.float32)
            s = max(height, width) * 1.0
            trans_input = get_affine_transform(
                c, s, 0, [cfg.input_w, cfg.input_h]).astype(np.float32)
            inv_trans_input = invert_affine(trans_input).astype(
                np.float32)
            out_w, out_h = cfg.input_w // cfg.down_ratio, \
                cfg.input_h // cfg.down_ratio
            inv_trans_output = get_affine_transform(
                c, s, 0, [out_w, out_h], inv=1).astype(np.float32)
            tile = lambda m: jnp.asarray(
                np.broadcast_to(m, (self.streams,) + m.shape))
            cached = (tile(inv_trans_input), tile(trans_input),
                      tile(inv_trans_output))
            self._trans[key] = cached
        inv_trans_input_d, trans_input_d, inv_trans_output_d = cached

        in_shape = (self.streams, height, width, 3)
        step = self._step.get(in_shape) or self._build(in_shape)
        if isinstance(images, (list, tuple)):
            frames = jnp.stack([jnp.asarray(f) for f in images])
        else:
            frames = jnp.asarray(images)
        if self.pre_images is None:
            self.pre_images = jnp.zeros(
                (self.streams, cfg.input_h, cfg.input_w, 3), jnp.float32)
        # jnp.array (copy=True) — jnp.asarray would zero-copy alias the
        # numpy buffer on the CPU backend, and the rebind below would
        # then race with the asynchronously-executing step reading it
        fresh = jnp.array(self._fresh)
        images_w, self.track_state, results = step(
            self.params, self.batch_stats, frames,
            inv_trans_input_d, trans_input_d,
            inv_trans_output_d, self._calib_for(height, width), fresh,
            self.pre_images, self.track_state)
        self.pre_images = images_w
        self._fresh = np.zeros_like(self._fresh)
        try:
            results.copy_to_host_async()
        except Exception:
            pass
        return results

    @staticmethod
    def fetch_stream(results: jnp.ndarray, stream: int,
                     out_thresh: float) -> List[Dict]:
        """Materialize one stream's results (same format as
        FusedDetector.fetch)."""
        return _fetch_one(np.asarray(results)[stream], out_thresh)

    @staticmethod
    def fetch_all(results: jnp.ndarray,
                  out_thresh: float) -> List[List[Dict]]:
        """All streams' results with ONE device->host transfer of the
        packed (S, K, C) matrix (fetch_stream per stream would cost S
        tunnel round trips). 2D-tracking columns only; use
        fetch_all_full for ddd/pose."""
        host = np.asarray(results)
        return [_fetch_one(host[s], out_thresh)
                for s in range(len(host))]

    def fetch_all_full(self, results: jnp.ndarray,
                       out_thresh: float) -> List[List[Dict]]:
        """fetch_all plus this task's extra fields (see
        FusedDetector.fetch_full)."""
        host = np.asarray(results)
        return [_fetch_one(host[s], out_thresh, self._extras)
                for s in range(len(host))]
