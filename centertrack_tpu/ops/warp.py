"""On-device affine warp + normalization — the fused input prologue.

The reference does cv2.warpAffine + normalize on the host per frame
(reference: src/lib/detector.py:207-239, src/lib/dataset/
generic_dataset.py:317-327). Here the raw uint8 frame is shipped to the
device once and the warp/normalize/bilinear-resample runs inside the same
jitted program as the network, removing the host hot loop and one H2D
copy of the fp32 image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def affine_warp(image: jnp.ndarray, inv_trans: jnp.ndarray,
                out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear warp of (H, W, C) by the INVERSE 2x3 affine.

    For each output pixel (x, y), samples the input at
    ``src = inv_trans @ [x, y, 1]`` with bilinear interpolation and zero
    padding outside — matching cv2.warpAffine(..., INTER_LINEAR,
    borderValue=0) up to cv2's fixed-point rounding.
    """
    h, w = image.shape[0], image.shape[1]
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # out_h, out_w
    sx = inv_trans[0, 0] * gx + inv_trans[0, 1] * gy + inv_trans[0, 2]
    sy = inv_trans[1, 0] * gx + inv_trans[1, 1] * gy + inv_trans[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yi, xi):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        vals = image[yi_c, xi_c]  # out_h, out_w, C
        return vals * valid[..., None].astype(image.dtype)

    img_f = image.astype(jnp.float32)

    def sample_f(yi, xi):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        vals = img_f[yi_c, xi_c]
        return vals * valid[..., None].astype(jnp.float32)

    v00 = sample_f(y0i, x0i)
    v01 = sample_f(y0i, x0i + 1)
    v10 = sample_f(y0i + 1, x0i)
    v11 = sample_f(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy) +
           v10 * (1 - fx) * fy + v11 * fx * fy)
    return out


def affine_warp_separable(image: jnp.ndarray, inv_trans: jnp.ndarray,
                          out_h: int, out_w: int,
                          precision=None) -> jnp.ndarray:
    """Bilinear warp for AXIS-ALIGNED affines (rot == 0) as two MXU
    matmuls with bilinear hat-weight matrices:

        out = W_y @ image @ W_x^T      (per channel)

    W_y[o, i] = max(0, 1 - |sy_o - i|) with sy_o = inv[1,1]*o + inv[1,2]
    — exactly bilinear interpolation with zero outside the image (rows
    beyond the border simply get no weight). The per-pixel gather
    formulation (affine_warp) costs ~19 ms for 1080p -> 544x960 on TPU.

    ``precision``: None -> HIGHEST (pixel-exact vs the cv2/gather
    bilinear reference; the default bf16 matmul mode costs ~0.5/255
    absolute pixel error). HIGHEST emulates fp32 with 6 bf16 MXU
    passes, which made this ~12.8 GFLOP prologue a measured 3.6 ms of
    the 14.4 ms fused serving step (docs/stage_probe.json); a bf16
    serving network quantizes its input to ~2x that error at the first
    conv anyway, so serving engines pass DEFAULT via
    Config.warp_precision='auto' and keep HIGHEST for fp32 parity runs.
    """
    h, w, c = image.shape
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    sy = inv_trans[1, 1] * ys + inv_trans[1, 2]
    sx = inv_trans[0, 0] * xs + inv_trans[0, 2]
    wy = jnp.maximum(
        0.0, 1.0 - jnp.abs(sy[:, None] -
                           jnp.arange(h, dtype=jnp.float32)[None, :]))
    wx = jnp.maximum(
        0.0, 1.0 - jnp.abs(sx[:, None] -
                           jnp.arange(w, dtype=jnp.float32)[None, :]))
    # channels-FIRST schedule: contracting the channels-last layout
    # directly ("pw,owc->opc") makes the x-pass a batched matmul with
    # N = C = 3 output lanes — 3/128 MXU utilization. Transposing the
    # (small, uint8) image to (C, H, W) first turns both passes into
    # well-tiled (out, K) @ (K, big) matmuls; the transposes are pure
    # byte moves on the smallest tensors in the op.
    img_f = jnp.transpose(image, (2, 0, 1)).astype(jnp.float32)
    tmp = jnp.einsum("oh,chw->cow", wy, img_f,
                     preferred_element_type=jnp.float32,
                     precision=precision)
    out = jnp.einsum("pw,cow->cop", wx, tmp,
                     preferred_element_type=jnp.float32,
                     precision=precision)
    return jnp.transpose(out, (1, 2, 0))


def preprocess_frame(frame_u8: jnp.ndarray, inv_trans: jnp.ndarray,
                     out_h: int, out_w: int, mean: jnp.ndarray,
                     std: jnp.ndarray, axis_aligned: bool = False,
                     precision=None) -> jnp.ndarray:
    """uint8 BGR frame -> normalized (1, out_h, out_w, 3) network input.

    Fuses warp + /255 + mean/std normalize
    (reference: detector.py:219-224). ``axis_aligned`` selects the MXU
    separable warp (valid whenever rot == 0, i.e. every test-time
    path); ``precision`` follows affine_warp_separable (None = exact
    HIGHEST, DEFAULT = fast bf16-MXU for bf16 serving).
    """
    if axis_aligned:
        warped = affine_warp_separable(frame_u8, inv_trans, out_h,
                                       out_w, precision=precision)
    else:
        warped = affine_warp(frame_u8, inv_trans, out_h, out_w)
    inp = (warped / 255.0 - mean) / std
    return inp[None]


def warp_precision_for(cfg):
    """Map Config.warp_precision to a lax.Precision for the serving
    warp: 'auto' -> DEFAULT (one bf16 MXU pass) when the network
    computes in bfloat16 — its first conv quantizes the input to ~2x
    the warp's bf16 rounding anyway — else HIGHEST; 'highest'/'default'
    force one mode for A/B and parity runs."""
    mode = getattr(cfg, "warp_precision", "auto")
    if mode == "auto":
        fast = getattr(cfg, "compute_dtype", "float32") == "bfloat16"
    elif mode in ("default", "fast"):
        fast = True
    elif mode == "highest":
        fast = False
    else:
        raise ValueError(
            f"warp_precision must be auto|highest|default, got {mode!r}")
    return (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)


def fix_res_meta(height: int, width: int, input_h: int, input_w: int):
    """Center/scale for fixed-resolution testing
    (reference: detector.py:193-197): center = image center,
    scale = max(h, w)."""
    c = np.array([width / 2.0, height / 2.0], dtype=np.float32)
    s = max(height, width) * 1.0
    return c, s
