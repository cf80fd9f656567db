"""Greedy IoU suppression in XLA (--nms option).

The reference ships a Cython NMS (src/lib/external/nms.pyx) that is
vestigial — the --nms flag exists (opts.py:151-152) but nothing imports
the module. Provided here as a fused on-device op for parity: given the
score-sorted top-K boxes from decode, suppress boxes with IoU above the
threshold against any higher-scoring kept box.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """(K, 4) x1y1x2y2 -> (K, K) IoU."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def nms_suppress(boxes: jnp.ndarray, scores: jnp.ndarray,
                 iou_thresh: float = 0.5) -> jnp.ndarray:
    """Greedy NMS over score-sorted (K, 4) boxes -> (K,) keep mask."""
    k = boxes.shape[0]
    iou = iou_matrix(boxes)

    def body(i, keep):
        # i is suppressed if any kept higher-scoring box overlaps it
        over = (iou[i] > iou_thresh) & keep & (
            jnp.arange(k) < i)
        return keep.at[i].set(~over.any() & keep[i])

    keep0 = scores > -jnp.inf
    return jax.lax.fori_loop(0, k, body, keep0)


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                classes: jnp.ndarray,
                iou_thresh: float = 0.5) -> jnp.ndarray:
    """(B, K, 4)/(B, K) per-class NMS -> (B, K) keep mask. Boxes of
    different classes never suppress each other (class-offset trick)."""
    offset = classes[..., None] * 1e4
    shifted = boxes + offset
    return jax.vmap(lambda b, s: nms_suppress(b, s, iou_thresh))(
        shifted, scores)
