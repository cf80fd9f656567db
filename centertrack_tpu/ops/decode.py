"""Fused heatmap decode: maxpool pseudo-NMS -> top-K -> head gathers.

JAX/NHWC re-design of the reference decode path
(reference: src/lib/model/utils.py:52-87, src/lib/model/decode.py:83-182).
Everything here jits into ONE XLA graph with static K, so the whole
peak-extraction pipeline is a single device program.

Layout note: feature maps are NHWC (TPU-native); the reference is NCHW.
Flat peak indices `inds` are still row-major over H*W (ind = y*W + x),
matching the reference convention so GT indices interop.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def nms_heat(heat: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """3x3 max-pool pseudo-NMS: keep pixels equal to their local max
    (reference: src/lib/model/utils.py:52-58). heat: (B, H, W, C)."""
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding="SAME")
    keep = (hmax == heat).astype(heat.dtype)
    return heat * keep


def gather_feat(feat: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of (B, HW, F) at (B, K) indices -> (B, K, F)
    (reference: src/lib/model/utils.py:16-20)."""
    return jnp.take_along_axis(feat, ind[:, :, None], axis=1)


def gather_feat_nhwc(fmap: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """Flatten (B, H, W, F) spatially and gather at flat indices (B, K)
    -> (B, K, F) (reference: src/lib/model/utils.py:22-26, which needs an
    NCHW permute first; NHWC needs none — a free win of the layout)."""
    b, h, w, f = fmap.shape
    return gather_feat(fmap.reshape(b, h * w, f), ind)


def topk_channel(scores: jnp.ndarray, k: int):
    """Per-channel top-K over the spatial plane
    (reference: src/lib/model/utils.py:60-69). scores: (B, H, W, C).

    Returns (topk_scores, topk_inds, topk_ys, topk_xs), each (B, C, K).
    """
    b, h, w, c = scores.shape
    flat = scores.reshape(b, h * w, c).transpose(0, 2, 1)  # B, C, HW
    topk_scores, topk_inds = jax.lax.top_k(flat, k)
    topk_ys = (topk_inds // w).astype(jnp.float32)
    topk_xs = (topk_inds % w).astype(jnp.float32)
    return topk_scores, topk_inds, topk_ys, topk_xs


def topk(scores: jnp.ndarray, k: int):
    """Two-stage top-K: per-class over H*W, then global over C*K
    (reference: src/lib/model/utils.py:71-87). scores: (B, H, W, C).

    Returns (score, inds, clses, ys, xs), each (B, K); inds are flat
    spatial indices (y*W + x).
    """
    b, h, w, c = scores.shape
    topk_scores, topk_inds, topk_ys, topk_xs = topk_channel(scores, k)
    topk_score, topk_ind = jax.lax.top_k(topk_scores.reshape(b, c * k), k)
    topk_clses = (topk_ind // k).astype(jnp.int32)
    gather = lambda x: jnp.take_along_axis(
        x.reshape(b, c * k), topk_ind, axis=1)
    return (topk_score, gather(topk_inds), topk_clses,
            gather(topk_ys), gather(topk_xs))


def _update_kps_with_hm(kps, output, num_joints, k,
                        bboxes=None, scores=None, thresh=0.2):
    """Snap regressed keypoints to nearby hm_hp peaks with bbox gating
    (reference: src/lib/model/decode.py:11-81). Shapes follow the
    reference exactly, vectorized over (B, J, K)."""
    if "hm_hp" not in output:
        return kps, kps
    hm_hp = nms_heat(output["hm_hp"])  # B,H,W,J
    b = kps.shape[0]
    kps = kps.reshape(b, k, num_joints, 2).transpose(0, 2, 1, 3)  # B,J,K,2
    reg_kps = kps[:, :, :, None, :]  # B,J,K,1,2 broadcast against K peaks
    hm_score, hm_inds, hm_ys, hm_xs = topk_channel(hm_hp, k)  # B,J,K

    if "hp_offset" in output or "reg" in output:
        hp_offset_map = output.get("hp_offset", output.get("reg"))
        hp_offset = gather_feat_nhwc(
            hp_offset_map, hm_inds.reshape(b, -1))  # B, J*K, 2
        hp_offset = hp_offset.reshape(b, num_joints, k, 2)
        hm_xs = hm_xs + hp_offset[:, :, :, 0]
        hm_ys = hm_ys + hp_offset[:, :, :, 1]
    else:
        hm_xs = hm_xs + 0.5
        hm_ys = hm_ys + 0.5

    mask = (hm_score > thresh).astype(jnp.float32)
    hm_score = (1 - mask) * -1 + mask * hm_score
    hm_ys = (1 - mask) * (-10000) + mask * hm_ys
    hm_xs = (1 - mask) * (-10000) + mask * hm_xs
    hm_kps = jnp.stack([hm_xs, hm_ys], axis=-1)[:, :, None, :, :]  # B,J,1,K,2
    dist = jnp.sqrt(((reg_kps - hm_kps) ** 2).sum(axis=4))  # B,J,K,K
    min_dist = dist.min(axis=3)
    min_ind = dist.argmin(axis=3)  # B,J,K
    hm_score = jnp.take_along_axis(hm_score, min_ind, axis=2)[..., None]
    hm_kps = jnp.take_along_axis(
        hm_kps.squeeze(2), min_ind[..., None].repeat(2, -1), axis=2)  # B,J,K,2
    mask = (hm_score < thresh)

    if bboxes is not None:
        l = bboxes[:, None, :, 0:1]
        t = bboxes[:, None, :, 1:2]
        r = bboxes[:, None, :, 2:3]
        bb = bboxes[:, None, :, 3:4]
        mask = ((hm_kps[..., 0:1] < l) | (hm_kps[..., 0:1] > r) |
                (hm_kps[..., 1:2] < t) | (hm_kps[..., 1:2] > bb) | mask)
    else:
        l = kps[:, :, :, 0:1].min(axis=1, keepdims=True)
        t = kps[:, :, :, 1:2].min(axis=1, keepdims=True)
        r = kps[:, :, :, 0:1].max(axis=1, keepdims=True)
        bb = kps[:, :, :, 1:2].max(axis=1, keepdims=True)
        margin = 0.25
        l = l - (r - l) * margin
        r = r + (r - l) * margin
        t = t - (bb - t) * margin
        bb = bb + (bb - t) * margin
        mask = ((hm_kps[..., 0:1] < l) | (hm_kps[..., 0:1] > r) |
                (hm_kps[..., 1:2] < t) | (hm_kps[..., 1:2] > bb) | mask)

    mask = mask.astype(jnp.float32)
    kps_score = (1 - mask) * hm_score + mask * \
        scores[:, None, :, None]  # B,J,K,1
    kps_score = scores * kps_score.mean(axis=1).reshape(b, k)
    mask2 = jnp.repeat(mask, 2, axis=-1)
    kps = (1 - mask2) * hm_kps + mask2 * kps
    kps = kps.transpose(0, 2, 1, 3).reshape(b, k, num_joints * 2)
    return kps, kps_score


def generic_decode(output: Dict[str, jnp.ndarray], k: int = 100,
                   num_classes: int = 1,
                   zero_tracking: bool = False) -> Dict[str, jnp.ndarray]:
    """Decode a dict of NHWC head maps into top-K detections
    (reference: src/lib/model/decode.py:83-182).

    All outputs are (B, K, ...) arrays; downstream post-processing maps
    them to image coordinates on host.
    """
    if "hm" not in output:
        return {}
    output = dict(output)
    if zero_tracking and "tracking" in output:
        output["tracking"] = output["tracking"] * 0

    heat = output["hm"]  # B,H,W,C
    b = heat.shape[0]
    heat = nms_heat(heat)
    scores, inds, clses, ys0, xs0 = topk(heat, k)

    cts = jnp.stack([xs0, ys0], axis=2)
    ret = {"scores": scores, "clses": clses.astype(jnp.float32),
           "xs": xs0, "ys": ys0, "cts": cts, "inds": inds}

    if "reg" in output:
        reg = gather_feat_nhwc(output["reg"], inds)  # B,K,2
        xs = xs0[:, :, None] + reg[:, :, 0:1]
        ys = ys0[:, :, None] + reg[:, :, 1:2]
    else:
        xs = xs0[:, :, None] + 0.5
        ys = ys0[:, :, None] + 0.5

    bboxes = None
    if "wh" in output:
        wh = gather_feat_nhwc(output["wh"], inds)  # B,K,F
        if wh.shape[2] == 2 * num_classes and num_classes > 1:
            # per-class wh variant (reference: decode.py:118-121)
            wh = wh.reshape(b, k, -1, 2)
            cats = clses[:, :, None, None].astype(jnp.int32)
            wh = jnp.take_along_axis(
                wh, jnp.broadcast_to(cats, (b, k, 1, 2)), axis=2).squeeze(2)
        else:
            wh = wh.reshape(b, k, 2)
        wh = jnp.maximum(wh, 0.0)
        bboxes = jnp.concatenate([
            xs - wh[..., 0:1] / 2, ys - wh[..., 1:2] / 2,
            xs + wh[..., 0:1] / 2, ys + wh[..., 1:2] / 2], axis=2)
        ret["bboxes"] = bboxes

    if "ltrb" in output:
        ltrb = gather_feat_nhwc(output["ltrb"], inds)  # B,K,4
        x0 = xs0[:, :, None]
        y0 = ys0[:, :, None]
        bboxes = jnp.concatenate([
            x0 + ltrb[..., 0:1], y0 + ltrb[..., 1:2],
            x0 + ltrb[..., 2:3], y0 + ltrb[..., 3:4]], axis=2)
        ret["bboxes"] = bboxes

    for head in ("tracking", "dep", "rot", "dim", "amodel_offset",
                 "nuscenes_att", "velocity"):
        if head in output:
            ret[head] = gather_feat_nhwc(output[head], inds)

    if "ltrb_amodal" in output:
        la = gather_feat_nhwc(output["ltrb_amodal"], inds)
        x0 = xs0[:, :, None]
        y0 = ys0[:, :, None]
        bboxes_amodal = jnp.concatenate([
            x0 + la[..., 0:1], y0 + la[..., 1:2],
            x0 + la[..., 2:3], y0 + la[..., 3:4]], axis=2)
        ret["bboxes_amodal"] = bboxes_amodal
        ret["bboxes"] = bboxes_amodal
        bboxes = bboxes_amodal

    if "hps" in output:
        kps = gather_feat_nhwc(output["hps"], inds)  # B,K,J*2
        num_joints = kps.shape[2] // 2
        kps = kps.reshape(b, k, num_joints, 2)
        kps = kps + jnp.stack([xs0, ys0], axis=-1)[:, :, None, :]
        kps = kps.reshape(b, k, num_joints * 2)
        kps, kps_score = _update_kps_with_hm(
            kps, output, num_joints, k, bboxes, scores)
        ret["hps"] = kps
        ret["kps_score"] = kps_score

    if "pre_inds" in output and output["pre_inds"] is not None:
        pre_inds = output["pre_inds"]  # B, pre_K
        width = output["hm"].shape[2]
        pre_ys = (pre_inds // width).astype(jnp.float32)
        pre_xs = (pre_inds % width).astype(jnp.float32)
        ret["pre_cts"] = jnp.stack([pre_xs, pre_ys], axis=2)

    return ret


def sigmoid_output(output: Dict[str, jnp.ndarray],
                   depth_scale: float = 1.0) -> Dict[str, jnp.ndarray]:
    """Apply output activations: sigmoid on heatmaps, inverse-sigmoid depth
    decode 1/sigmoid(x) - 1 (reference: src/lib/detector.py:300-308)."""
    output = dict(output)
    if "hm" in output:
        output["hm"] = jax.nn.sigmoid(output["hm"])
    if "hm_hp" in output:
        output["hm_hp"] = jax.nn.sigmoid(output["hm_hp"])
    if "dep" in output:
        output["dep"] = (1.0 / (jax.nn.sigmoid(output["dep"]) + 1e-6)
                         - 1.0) * depth_scale
    return output
