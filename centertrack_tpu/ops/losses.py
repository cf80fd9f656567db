"""Training losses, pure JAX (reference: src/lib/model/losses.py).

All losses consume NHWC maps and fixed-capacity (B, M) target arrays, so
the whole loss graph jits with static shapes. Branches that the reference
expresses with data-dependent Python (`if num_pos == 0`) become
`jnp.where` selects.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from centertrack_tpu.ops.decode import gather_feat_nhwc


def clamp_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """sigmoid clamped to [1e-4, 1-1e-4]
    (reference: src/lib/model/utils.py:8-10)."""
    return jnp.clip(jax.nn.sigmoid(x), 1e-4, 1 - 1e-4)


def fast_focal_loss(out: jnp.ndarray, target: jnp.ndarray,
                    ind: jnp.ndarray, mask: jnp.ndarray,
                    cat: jnp.ndarray) -> jnp.ndarray:
    """CornerNet penalty-reduced focal loss, gathered-positives form
    (reference: src/lib/model/losses.py:67-97).

    Args:
      out, target: (B, H, W, C) — `out` already sigmoided+clamped.
      ind, mask, cat: (B, M) — flat GT indices, validity, class ids.
    """
    neg_weights = jnp.power(1.0 - target, 4)
    neg_loss = (jnp.log(1.0 - out) * jnp.power(out, 2) * neg_weights).sum()

    pos_pred_pix = gather_feat_nhwc(out, ind)  # B, M, C
    pos_pred = jnp.take_along_axis(
        pos_pred_pix, cat[:, :, None].astype(jnp.int32), axis=2)  # B, M, 1
    num_pos = mask.sum()
    pos_loss = (jnp.log(pos_pred) * jnp.power(1.0 - pos_pred, 2) *
                mask[:, :, None]).sum()
    return jnp.where(num_pos == 0,
                     -neg_loss,
                     -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def reg_weighted_l1_loss(output: jnp.ndarray, mask: jnp.ndarray,
                         ind: jnp.ndarray,
                         target: jnp.ndarray) -> jnp.ndarray:
    """Masked L1 at GT indices (reference: losses.py:117-126).

    output: (B, H, W, F) map; mask/target: (B, M, F); ind: (B, M).
    """
    pred = gather_feat_nhwc(output, ind)  # B, M, F
    loss = jnp.abs(pred * mask - target * mask).sum()
    return loss / (mask.sum() + 1e-4)


def weighted_bce_loss(output: jnp.ndarray, mask: jnp.ndarray,
                      ind: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Masked BCE-with-logits at GT indices (reference: losses.py:129-142).

    Used for nuScenes attributes. output: (B, H, W, F) logits.
    """
    pred = gather_feat_nhwc(output, ind)  # B, M, F
    # log(1 + exp(-|x|)) formulation for stability, as BCEWithLogits does.
    bce = jnp.maximum(pred, 0) - pred * target + jnp.log1p(
        jnp.exp(-jnp.abs(pred)))
    loss = (mask * bce).sum()
    return loss / (mask.sum() + 1e-4)


def _smooth_l1(diff: jnp.ndarray) -> jnp.ndarray:
    ad = jnp.abs(diff)
    return jnp.where(ad < 1.0, 0.5 * ad * ad, ad - 0.5)


def _masked_mean(values: jnp.ndarray, sel: jnp.ndarray) -> jnp.ndarray:
    cnt = sel.sum()
    return jnp.where(cnt > 0, (values * sel).sum() / jnp.maximum(cnt, 1.0),
                     0.0)


def bin_rot_loss(output: jnp.ndarray, mask: jnp.ndarray, ind: jnp.ndarray,
                 rotbin: jnp.ndarray, rotres: jnp.ndarray) -> jnp.ndarray:
    """2-bin orientation loss: bin classification CE + sin/cos residual
    smooth-L1 (reference: losses.py:144-192).

    output: (B, H, W, 8) map with layout
      [bin1_cls0, bin1_cls1, bin1_sin, bin1_cos,
       bin2_cls0, bin2_cls1, bin2_sin, bin2_cos];
    rotbin: (B, M, 2) int; rotres: (B, M, 2); mask: (B, M).
    """
    pred = gather_feat_nhwc(output, ind)  # B, M, 8
    b, m, _ = pred.shape
    pred = pred.reshape(b * m, 8)
    rotbin = rotbin.reshape(b * m, 2)
    rotres = rotres.reshape(b * m, 2)
    mask_f = mask.reshape(b * m, 1).astype(jnp.float32)

    def bin_ce(logits2, target):
        # reference compute_bin_loss: logits are zeroed outside the mask,
        # then a plain mean cross-entropy over ALL rows (losses.py:156-159).
        logits2 = logits2 * mask_f
        logz = jax.nn.logsumexp(logits2, axis=1)
        picked = jnp.take_along_axis(
            logits2, target[:, None].astype(jnp.int32), axis=1)[:, 0]
        return (logz - picked).mean()

    loss_bin1 = bin_ce(pred[:, 0:2], rotbin[:, 0])
    loss_bin2 = bin_ce(pred[:, 4:6], rotbin[:, 1])

    # Residual loss over rows whose bin flag is set
    # (reference: losses.py:173-191 uses index_select; masked mean here).
    sel1 = (rotbin[:, 0] != 0).astype(jnp.float32)
    loss_sin1 = _masked_mean(_smooth_l1(pred[:, 2] - jnp.sin(rotres[:, 0])),
                             sel1)
    loss_cos1 = _masked_mean(_smooth_l1(pred[:, 3] - jnp.cos(rotres[:, 0])),
                             sel1)
    sel2 = (rotbin[:, 1] != 0).astype(jnp.float32)
    loss_sin2 = _masked_mean(_smooth_l1(pred[:, 6] - jnp.sin(rotres[:, 1])),
                             sel2)
    loss_cos2 = _masked_mean(_smooth_l1(pred[:, 7] - jnp.cos(rotres[:, 1])),
                             sel2)
    loss_res = loss_sin1 + loss_cos1 + loss_sin2 + loss_cos2
    return loss_bin1 + loss_bin2 + loss_res


def generic_loss(outputs, batch: Dict[str, jnp.ndarray], heads: Dict[str, int],
                 weights: Dict[str, float], num_stacks: int = 1,
                 depth_scale_inv: bool = True):
    """Total multi-head loss (reference: src/lib/trainer.py:20-86).

    Args:
      outputs: list of per-stack dicts of NHWC head maps (raw logits).
      batch: target dict with 'hm', 'ind', 'mask', 'cat' and per-head
        targets/masks, all fixed-capacity.
    Returns (total, per_head dict).
    """
    losses = {h: 0.0 for h in heads}
    for s in range(num_stacks):
        output = dict(outputs[s])
        if "hm" in output:
            output["hm"] = clamp_sigmoid(output["hm"])
        if "hm_hp" in output:
            output["hm_hp"] = clamp_sigmoid(output["hm_hp"])
        if "dep" in output and depth_scale_inv:
            output["dep"] = 1.0 / (jax.nn.sigmoid(output["dep"]) + 1e-6) - 1.0

        if "hm" in output:
            losses["hm"] += fast_focal_loss(
                output["hm"], batch["hm"], batch["ind"],
                batch["mask"], batch["cat"]) / num_stacks

        for head in ("reg", "wh", "tracking", "ltrb", "ltrb_amodal", "hps",
                     "dep", "dim", "amodel_offset", "velocity"):
            if head in output:
                losses[head] += reg_weighted_l1_loss(
                    output[head], batch[head + "_mask"], batch["ind"],
                    batch[head]) / num_stacks

        if "hm_hp" in output:
            losses["hm_hp"] += fast_focal_loss(
                output["hm_hp"], batch["hm_hp"], batch["hp_ind"],
                batch["hm_hp_mask"], batch["joint"]) / num_stacks
            if "hp_offset" in output:
                losses["hp_offset"] += reg_weighted_l1_loss(
                    output["hp_offset"], batch["hp_offset_mask"],
                    batch["hp_ind"], batch["hp_offset"]) / num_stacks

        if "rot" in output:
            losses["rot"] += bin_rot_loss(
                output["rot"], batch["rot_mask"], batch["ind"],
                batch["rotbin"], batch["rotres"]) / num_stacks

        if "nuscenes_att" in output:
            losses["nuscenes_att"] += weighted_bce_loss(
                output["nuscenes_att"], batch["nuscenes_att_mask"],
                batch["ind"], batch["nuscenes_att"]) / num_stacks

    total = 0.0
    for head in heads:
        total = total + weights[head] * losses[head]
    losses["tot"] = total
    return total, losses
