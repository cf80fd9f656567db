"""Gaussian radius law + heatmap rendering.

Two implementations of the CornerNet-style splat:
  * numpy reference (`draw_umich_gaussian`) — bit-compatible with the
    reference (src/lib/utils/image.py:105-154), used for golden tests and
    as a host fallback;
  * `render_gaussians` — a vectorized on-device JAX version that renders
    ALL objects in one fused op (max-composite over objects via
    segment_max), replacing the reference's serial CPU splatting in both
    GT rendering (generic_dataset.py:423-458) and inference-time pre_hm
    rendering (detector.py:254-290).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_radius(det_size, min_overlap: float = 0.7) -> float:
    """Minimum gaussian radius keeping IoU >= min_overlap
    (reference: src/lib/utils/image.py:105-125)."""
    height, width = det_size

    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(b1 ** 2 - 4 * a1 * c1)
    r1 = (b1 + sq1) / 2

    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = np.sqrt(b2 ** 2 - 4 * a2 * c2)
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = np.sqrt(b3 ** 2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / 2
    return min(r1, r2, r3)


def gaussian2d(shape, sigma: float = 1.0) -> np.ndarray:
    """(reference: src/lib/utils/image.py:129-135)"""
    m, n = [(ss - 1.0) / 2.0 for ss in shape]
    y, x = np.ogrid[-m:m + 1, -n:n + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def draw_umich_gaussian(heatmap: np.ndarray, center, radius: int,
                        k: float = 1.0) -> np.ndarray:
    """Max-composited gaussian splat, numpy reference implementation
    (reference: src/lib/utils/image.py:138-154)."""
    diameter = 2 * radius + 1
    gaussian = gaussian2d((diameter, diameter), sigma=diameter / 6)
    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape[0:2]
    left, right = min(x, radius), min(width - x, radius + 1)
    top, bottom = min(y, radius), min(height - y, radius + 1)
    masked_heatmap = heatmap[y - top:y + bottom, x - left:x + right]
    masked_gaussian = gaussian[radius - top:radius + bottom,
                               radius - left:radius + right]
    if min(masked_gaussian.shape) > 0 and min(masked_heatmap.shape) > 0:
        np.maximum(masked_heatmap, masked_gaussian * k, out=masked_heatmap)
    return heatmap


def render_gaussians(height: int, width: int, num_channels: int,
                     cts_int: jnp.ndarray, radii: jnp.ndarray,
                     channels: jnp.ndarray, ks: jnp.ndarray,
                     valid: jnp.ndarray) -> jnp.ndarray:
    """Render N truncated gaussians into an (H, W, C) heatmap on device.

    Args:
      cts_int:  (N, 2) int32 integer centers (x, y).
      radii:    (N,)  int32 gaussian radii (>= 0).
      channels: (N,)  int32 target channel per object (class id, 0-based).
      ks:       (N,)  float32 peak value per object (1.0 normally, the
                ``conf`` factor for disturbed pre_hm splats).
      valid:    (N,)  bool/float mask of live objects.

    Equivalent to looping draw_umich_gaussian over objects: each object
    contributes k * exp(-(dx^2+dy^2) / (2*sigma^2)) inside the box
    |dx| <= r, |dy| <= r (sigma = (2r+1)/6), and channels are combined by
    elementwise max. Out-of-image truncation is automatic because the
    output grid is bounded.
    """
    n = cts_int.shape[0]
    ys = jnp.arange(height, dtype=jnp.float32)[None, :, None]   # 1,H,1
    xs = jnp.arange(width, dtype=jnp.float32)[None, None, :]    # 1,1,W
    cx = cts_int[:, 0].astype(jnp.float32)[:, None, None]       # N,1,1
    cy = cts_int[:, 1].astype(jnp.float32)[:, None, None]
    r = radii.astype(jnp.float32)[:, None, None]
    diameter = 2.0 * r + 1.0
    sigma = diameter / 6.0
    dx = xs - cx
    dy = ys - cy
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    in_box = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
    v = valid.astype(jnp.float32)[:, None, None]
    g = g * in_box.astype(jnp.float32) * ks[:, None, None].astype(jnp.float32)
    g = g * v
    # Scatter-max each object's map into its class channel.
    seg = jnp.where(valid.astype(bool), channels, num_channels)  # dead -> bin C
    hm = jax.ops.segment_max(
        g, seg, num_segments=num_channels + 1, indices_are_sorted=False)
    hm = jnp.maximum(hm[:num_channels], 0.0)  # empty segments are -inf
    return jnp.transpose(hm, (1, 2, 0))  # H, W, C


def render_pre_hm(height: int, width: int, cts_int: jnp.ndarray,
                  radii: jnp.ndarray, ks: jnp.ndarray,
                  valid: jnp.ndarray) -> jnp.ndarray:
    """Single-channel pre_hm render (H, W, 1) — the inference-time input
    heatmap from tracked centers (reference: detector.py:254-290) and the
    train-time disturbed pre_hm (generic_dataset.py:205-255)."""
    zeros = jnp.zeros_like(cts_int[:, 0])
    hm = render_gaussians(height, width, 1, cts_int, radii, zeros, ks, valid)
    return hm
