"""Modulated deformable convolution v2 (DCNv2) for TPU.

The reference consumes an upstream CUDA extension
(reference: src/lib/model/networks/DCNv2 submodule, used at
src/lib/model/networks/dla.py:506-518). This module provides the
TPU-native equivalent as a pure-XLA op structured for the MXU:

  for each of the KH*KW kernel taps:
      bilinear-gather the input at (base + tap + predicted offset)
      multiply by the predicted modulation mask
      matmul with that tap's (Cin, Cout) weight slice   <- MXU
      accumulate

This keeps peak memory at O(B*H*W*C) (no 9x im2col blowup) and puts all
FLOPs into 9 large matmuls. Offsets/masks come from a regular conv
computed by the caller. Offset channel layout: interleaved (dy, dx) per
tap, taps row-major — documented here because it differs from upstream
DCNv2's (all-dy, all-dx) split; a weight converter must de-interleave.

A Pallas kernel with the same signature can replace `deform_conv2d`
transparently (see centertrack_tpu/ops/dcn_pallas.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(x: jnp.ndarray, py: jnp.ndarray,
                    px: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample (B, H, W, C) at float positions (B, Ho, Wo).

    Zero outside the image (matching the CUDA kernel's behavior of
    skipping out-of-bounds corners).
    """
    b, h, w, c = x.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = py - y0
    fx = px - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    x_flat = x.reshape(b, h * w, c)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        idx = (yc * w + xc).reshape(b, -1)
        vals = jnp.take_along_axis(x_flat, idx[:, :, None], axis=1)
        vals = vals.reshape(*yi.shape, c)
        return vals * valid[..., None].astype(x.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    fy = fy[..., None].astype(x.dtype)
    fx = fx[..., None].astype(x.dtype)
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
            v10 * fy * (1 - fx) + v11 * fy * fx)


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                  weight: jnp.ndarray, bias: jnp.ndarray | None = None,
                  stride: int = 1, padding: int = 1,
                  dilation: int = 1) -> jnp.ndarray:
    """Modulated deformable conv.

    Args:
      x:      (B, H, W, Cin)
      offset: (B, Ho, Wo, 2*KH*KW) — (dy, dx) interleaved per tap.
      mask:   (B, Ho, Wo, KH*KW) — already sigmoided modulation.
      weight: (KH, KW, Cin, Cout)
      bias:   (Cout,) or None
    Returns (B, Ho, Wo, Cout).
    """
    kh, kw, cin, cout = weight.shape
    b, h, w, _ = x.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y = (jnp.arange(ho, dtype=x.dtype) * stride - padding)[None, :, None]
    base_x = (jnp.arange(wo, dtype=x.dtype) * stride - padding)[None, None, :]

    out = jnp.zeros((b, ho, wo, cout), dtype=x.dtype)
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            dy = offset[..., 2 * t]
            dx = offset[..., 2 * t + 1]
            py = base_y + i * dilation + dy
            px = base_x + j * dilation + dx
            sampled = bilinear_sample(x, py, px)  # B,Ho,Wo,Cin
            sampled = sampled * mask[..., t][..., None]
            out = out + jnp.einsum(
                "bhwc,cd->bhwd", sampled, weight[i, j],
                preferred_element_type=out.dtype)
    if bias is not None:
        out = out + bias
    return out


def plain_conv_reference(x, weight, bias=None, stride=1, padding=1,
                         dilation=1):
    """Regular conv via deform_conv2d with zero offsets and unit mask —
    used by tests to validate the deformable path against lax.conv."""
    kh, kw = weight.shape[0], weight.shape[1]
    b, h, w, _ = x.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    offset = jnp.zeros((b, ho, wo, 2 * kh * kw), x.dtype)
    mask = jnp.ones((b, ho, wo, kh * kw), x.dtype)
    return deform_conv2d(x, offset, mask, weight, bias, stride, padding,
                         dilation)
