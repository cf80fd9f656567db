"""On-device GT heatmap rendering from compact splat descriptors.

Converts the fixed-capacity arrays emitted by GenericDataset into the
dense 'hm' / 'pre_hm' / 'hm_hp' targets INSIDE the jitted train step —
replacing the reference's serial CPU gaussian splatting in DataLoader
workers (reference: generic_dataset.py:423-515, :205-255, :386-398).
Batched with vmap; everything is static-shape.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from centertrack_tpu.ops.gaussian import render_gaussians, render_pre_hm


def _apply_ignore_regions(hm: jnp.ndarray, boxes: jnp.ndarray,
                          cats: jnp.ndarray, valid: jnp.ndarray,
                          ignore_val: float = 1.0) -> jnp.ndarray:
    """Raise hm to ignore_val inside rectangular regions.

    cat == -1 -> all channels; else the single channel.
    Box semantics follow the reference's integer slicing
    (hm[:, int(y1):int(y2)+1, int(x1):int(x2)+1], generic_dataset.py:386-398).
    """
    h, w, c = hm.shape
    ys = jnp.arange(h)[:, None, None]           # H,1,1
    xs = jnp.arange(w)[None, :, None]           # 1,W,1
    cs = jnp.arange(c)[None, None, :]           # 1,1,C

    def body(hm, args):
        box, cat, v = args
        x1 = jnp.floor(box[0]).astype(jnp.int32)
        y1 = jnp.floor(box[1]).astype(jnp.int32)
        x2 = jnp.floor(box[2]).astype(jnp.int32)
        y2 = jnp.floor(box[3]).astype(jnp.int32)
        in_box = ((ys >= y1) & (ys <= y2) & (xs >= x1) & (xs <= x2))
        ch = (cat < 0) | (cs == cat)
        m = in_box & ch & v
        hm = jnp.where(m, jnp.maximum(hm, ignore_val), hm)
        return hm, None

    hm, _ = jax.lax.scan(body, hm, (boxes, cats, valid))
    return hm


def render_single(batch: Dict[str, jnp.ndarray], output_h: int,
                  output_w: int, num_classes: int, input_h: int,
                  input_w: int, num_joints: int, with_pre_hm: bool,
                  with_hm_hp: bool) -> Dict[str, jnp.ndarray]:
    """Render targets for ONE sample. Returns dict with 'hm' and
    optionally 'pre_hm' / 'hm_hp'."""
    out = {}
    hm = render_gaussians(
        output_h, output_w, num_classes, batch["hm_cts"],
        batch["hm_radii"], batch["cat"].astype(jnp.int32),
        jnp.ones_like(batch["hm_radii"], jnp.float32), batch["hm_valid"])
    hm = _apply_ignore_regions(hm, batch["ignore_boxes"],
                               batch["ignore_cat"], batch["ignore_valid"])
    out["hm"] = hm

    if with_pre_hm and "pre_cts_int" in batch:
        out["pre_hm"] = render_pre_hm(
            input_h, input_w, batch["pre_cts_int"], batch["pre_radii"],
            batch["pre_ks"], batch["pre_valid"])

    if with_hm_hp and "hm_hp_cts" in batch:
        hm_hp = render_gaussians(
            output_h, output_w, num_joints, batch["hm_hp_cts"],
            batch["hm_hp_radii"], batch["hm_hp_joint"],
            jnp.ones_like(batch["hm_hp_radii"], jnp.float32),
            batch["hm_hp_splat_valid"])
        hm_hp = _apply_ignore_regions(
            hm_hp, batch["hm_hp_ignore_boxes"],
            batch["hm_hp_ignore_joint"], batch["hm_hp_ignore_valid"])
        # labeled-invisible points: force exact peak to ignore_val
        # (reference: generic_dataset.py:543-544)
        pts = batch["hm_hp_point_ignore"]
        pj = batch["hm_hp_point_ignore_joint"]
        pv = batch["hm_hp_point_ignore_valid"]

        def body(hm, args):
            pt, j, v = args
            val = jnp.where(v, 1.0, hm[pt[1], pt[0], j])
            return hm.at[pt[1], pt[0], j].set(val), None

        hm_hp, _ = jax.lax.scan(body, hm_hp, (pts, pj, pv))
        out["hm_hp"] = hm_hp
    return out


def render_batch(batch: Dict[str, jnp.ndarray], cfg) -> Dict[str, jnp.ndarray]:
    """vmap render_single over the batch and merge into the batch dict."""
    heads = cfg.heads_dict
    # hm_hp has one channel per joint (reference: opts.py:351-354), so the
    # head width IS dataset_meta.num_joints — no separate plumbing needed.
    num_joints = heads.get("hm_hp", 0)
    fn = lambda b: render_single(
        b, cfg.output_h, cfg.output_w, cfg.num_classes, cfg.input_h,
        cfg.input_w, num_joints, cfg.pre_hm, "hm_hp" in heads)
    keys = ["hm_cts", "hm_radii", "hm_valid", "cat", "ignore_boxes",
            "ignore_cat", "ignore_valid", "pre_cts_int", "pre_radii",
            "pre_ks", "pre_valid", "hm_hp_cts", "hm_hp_radii",
            "hm_hp_joint", "hm_hp_splat_valid", "hm_hp_ignore_boxes",
            "hm_hp_ignore_joint", "hm_hp_ignore_valid",
            "hm_hp_point_ignore", "hm_hp_point_ignore_joint",
            "hm_hp_point_ignore_valid"]
    sub = {k: batch[k] for k in keys if k in batch}
    rendered = jax.vmap(fn)(sub)
    merged = dict(batch)
    merged.update(rendered)
    return merged
