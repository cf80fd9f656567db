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
tap, taps row-major — the SAME convention upstream DCNv2's CUDA kernel
uses (its chunk/cat of the offset-mask conv output is a layout no-op;
the kernel indexes channel 2t as dy, 2t+1 as dx of tap t), so weight
conversion is identity on these channels.

A Pallas kernel with the same signature can replace `deform_conv2d`
transparently (see centertrack_tpu/ops/dcn_pallas.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Process-level default for the clamped-DCN schedule, set from
# Config.local_impl by the engines/trainer at construction (jitted
# programs close over the choice at trace time). Resolution order:
# CT_LOCAL_IMPL env var (experiment escape hatch) > this default
# (when not 'auto') > the measured mode-switch heuristic.
_LOCAL_IMPL_DEFAULT = "auto"
_LOCAL_IMPLS = ("auto", "taploop", "premul", "fused", "shiftfirst")


def set_local_impl(impl: str) -> None:
    """Install Config.local_impl as the process default schedule for
    `deform_conv2d_local` (see Config.local_impl docs)."""
    global _LOCAL_IMPL_DEFAULT
    impl = impl or "auto"
    if impl not in _LOCAL_IMPLS:
        raise ValueError(
            f"local_impl must be one of {_LOCAL_IMPLS}, got {impl!r}")
    _LOCAL_IMPL_DEFAULT = impl


def resolve_local_impl(train: bool, cin: int, cout: int,
                       batch: int = 1) -> str:
    """The schedule `deform_conv2d_local` will run, after the env var,
    the Config-installed default, and the auto heuristic.

    The auto heuristic is batch-aware: the premul/fused inference
    schedules materialize (B, H+2p, W+2p, [9,] C) padded transients,
    which win at B=1 (docs/dcn_premul_ab.json) but scale with B and
    collapse under multi-stream serving — measured on v5e at S=6,
    dla_34 544x960 (docs/dcn_ms_ab.json): taploop 97.1 aggregate fps,
    fused 90.7, premul 29.2. This was the r4 multi-stream regression
    (96.6 -> 29.9 in BENCH_r04.json): the B=1-tuned default was applied
    at B=6. Batched inference therefore uses taploop, like training.
    """
    env = os.environ.get("CT_LOCAL_IMPL", "")
    if env:
        return env
    if _LOCAL_IMPL_DEFAULT != "auto":
        return _LOCAL_IMPL_DEFAULT
    if train or batch > 1:
        return "taploop"
    use_premul = cout < cin or cin == cout == 64
    return "premul" if use_premul else "fused"


def bilinear_sample(x: jnp.ndarray, py: jnp.ndarray,
                    px: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample (B, H, W, C) at float positions (B, Ho, Wo).

    Zero outside the image (matching the CUDA kernel's behavior of
    skipping out-of-bounds corners). Position math runs in fp32 even
    for bf16 features: at W=240 the bf16 ulp is 1.0, which would
    quantize away the fractional sample position entirely.
    """
    b, h, w, c = x.shape
    py = py.astype(jnp.float32)
    px = px.astype(jnp.float32)
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


def _corner_slots(x: jnp.ndarray) -> jnp.ndarray:
    """Pack each padded flat position's 4 bilinear corners into the
    channel dim.

    x is first zero-padded to (h+3, w+3) so that every sample position
    clamped into [-1, h] x [-1, w] addresses a valid 2x2 corner patch.
    Returns (B, L, 4*C) where row p = concat of padded-flat positions
    [p, p+1, p+w', p+w'+1] (w' = w+3). One 4C-wide gather then fetches
    every corner of a sample point — a 512-byte contiguous slice at
    C=64/bf16, which is the layout the TPU gather engine wants (4x
    fewer gather slices than corner-wise gathers).
    """
    b, h, w, c = x.shape
    wp = w + 3
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    pf = xp.reshape(b, -1, c)  # (B, (h+3)*(w+3), C)
    ln = (h + 3) * wp - wp - 1
    return jnp.concatenate(
        [pf[:, :ln], pf[:, 1:ln + 1], pf[:, wp:ln + wp],
         pf[:, wp + 1:ln + wp + 1]], axis=2)


def _deform_conv2d_slot(x, offset, mask, weight, bias):
    """3x3/stride-1 fast path of `deform_conv2d` (same semantics).

    Sample positions are computed in fp32 and CLAMPED to the 1-px
    zero-pad ring [-1, h] x [-1, w]: bilinear interpolation against
    zero padding there is algebraically identical to the CUDA kernel's
    skip-out-of-bounds-corners rule (fully-outside samples clamp onto
    pure zero texels), so no per-corner validity masks are needed.
    Each tap then needs ONE slot-packed gather for all 4 corners plus
    one MXU matmul with fp32 accumulation.
    """
    b, h, w, cin = x.shape
    cout = weight.shape[-1]
    wp = w + 3
    xc = _corner_slots(x)
    base_y = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    base_x = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    out = jnp.zeros((b, h, w, cout), jnp.float32)
    for i in range(3):
        for j in range(3):
            t = i * 3 + j
            py = base_y + (i - 1) + offset[..., 2 * t].astype(jnp.float32)
            px = base_x + (j - 1) + offset[..., 2 * t + 1].astype(jnp.float32)
            py = jnp.clip(py, -1.0, float(h))
            px = jnp.clip(px, -1.0, float(w))
            y0 = jnp.floor(py)
            x0 = jnp.floor(px)
            # interpolation weights stay fp32 (matching the small-map
            # path) so results agree across the h*w crossover; the
            # corner-combine einsum accumulates in fp32 explicitly.
            fy = py - y0
            fx = px - x0
            m = mask[..., t].astype(jnp.float32)
            cw = jnp.stack([(1 - fy) * (1 - fx), (1 - fy) * fx,
                            fy * (1 - fx), fy * fx], -1) * m[..., None]
            # +1 shifts into the pad ring; always in range by the clamp
            idx = ((y0.astype(jnp.int32) + 1) * wp +
                   x0.astype(jnp.int32) + 1).reshape(b, -1)
            vals = jnp.take_along_axis(xc, idx[:, :, None], axis=1,
                                       mode="clip")
            vals = vals.reshape(b, h, w, 4, cin)
            sampled = jnp.einsum("bhwsc,bhws->bhwc", vals, cw,
                                 preferred_element_type=jnp.float32
                                 ).astype(x.dtype)
            out = out + jnp.einsum(
                "bhwc,cd->bhwd", sampled, weight[i, j],
                preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _deform_conv2d_slot_fused(x, offset, mask, weight, bias):
    """Tap-fused variant of `_deform_conv2d_slot` (same semantics).

    All 9 kernel taps are folded into ONE slot-packed gather of
    (B, 9*H*W, 4*Cin) followed by ONE (H*W, 9*Cin) x (9*Cin, Cout)
    matmul. Versus the per-tap loop this trades 9 thin K=Cin matmuls
    (half-idle MXU at Cin=64 on the 128x128 systolic array) for a
    single K=9*Cin one, and lets the gather engine stream 9x the
    slices per dispatch. Gathered bytes are identical; peak transient
    memory grows to the (B, 9, H, W, 4, Cin) corner tensor, which at
    B=1 neck shapes tops out at ~150 MB — fine in 16 GB HBM.
    """
    b, h, w, cin = x.shape
    cout = weight.shape[-1]
    wp = w + 3
    xc = _corner_slots(x)
    base_y = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    base_x = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    # (B, H, W, 9, 2) -> per-tap (B, 9, H, W) planes
    off = offset.astype(jnp.float32).reshape(b, h, w, 9, 2)
    dy = jnp.moveaxis(off[..., 0], 3, 1)
    dx = jnp.moveaxis(off[..., 1], 3, 1)
    taps = jnp.arange(9)
    ti = (taps // 3 - 1).astype(jnp.float32)[None, :, None, None]
    tj = (taps % 3 - 1).astype(jnp.float32)[None, :, None, None]
    py = jnp.clip(base_y + ti + dy, -1.0, float(h))
    px = jnp.clip(base_x + tj + dx, -1.0, float(w))
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = py - y0
    fx = px - x0
    m = jnp.moveaxis(mask.astype(jnp.float32), 3, 1)
    cw = jnp.stack([(1 - fy) * (1 - fx), (1 - fy) * fx,
                    fy * (1 - fx), fy * fx], -1) * m[..., None]
    idx = ((y0.astype(jnp.int32) + 1) * wp +
           x0.astype(jnp.int32) + 1).reshape(b, -1)
    vals = jnp.take_along_axis(xc, idx[:, :, None], axis=1, mode="clip")
    vals = vals.reshape(b, 9, h, w, 4, cin)
    sampled = jnp.einsum("bthwsc,bthws->bthwc", vals, cw,
                         preferred_element_type=jnp.float32
                         ).astype(x.dtype)
    # tap axis flattens next to Cin so weight's (i, j, Cin) row-major
    # flatten lines up: k = t*Cin + c
    sampled = jnp.moveaxis(sampled, 1, 3).reshape(b, h, w, 9 * cin)
    out = jnp.einsum("bhwk,kd->bhwd", sampled,
                     weight.reshape(9 * cin, cout).astype(x.dtype),
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _deform_conv2d_onehot(x, offset, mask, weight, bias):
    """Gather-free EXACT path for small maps (same semantics).

    Bilinear sampling is linear in the input, so it can be written as a
    matmul: for tap t, sampled_t = M_t @ x_pad where M_t is (L, Lp) with
    the 4 bilinear corner weights (pre-multiplied by the modulation
    mask) as its only nonzeros per row. Because the tap projection is
    also linear, it commutes to the cheap side:

        out = sum_t (M_t @ x_pad) @ W_t = M_flat @ proj
        proj = x_pad @ W  reshaped to (9*Lp, Cout), M_flat (L, 9*Lp)

    i.e. ONE fat MXU matmul replaces 9*L*4 gather slices — the gather
    engine (8 ns/slice on v5e, the exact-path bottleneck) never runs.
    M is materialized dense, so this only pays off where 9*L*Lp stays
    small: the stride-16/32 neck maps (34x60: M is 85 MB bf16; 17x30:
    5.5 MB). Positions use the same clamp-into-the-zero-pad-ring trick
    as the slot path, so out-of-bounds semantics match the CUDA
    kernel's skip-invalid-corners rule exactly.

    M is built in x.dtype: at bf16 the corner weights round to 2^-8
    relative — the same rounding the slot path takes when it casts the
    fp32-interpolated samples to bf16 before the weight matmul, so the
    two exact paths are precision-equivalent (and both are fully fp32
    when x is fp32).
    """
    b, h, w, cin = x.shape
    cout = weight.shape[-1]
    wp = w + 3
    lp = (h + 3) * wp
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0))).reshape(b, lp, cin)
    # proj[b, t, q, o] = x_pad[b, q] @ weight[tap t]
    proj = jnp.einsum("blc,tcd->btld", xp,
                      weight.reshape(9, cin, cout).astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)

    base_y = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    base_x = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    off = offset.astype(jnp.float32).reshape(b, h, w, 9, 2)
    dy = jnp.moveaxis(off[..., 0], 3, 1)
    dx = jnp.moveaxis(off[..., 1], 3, 1)
    taps = jnp.arange(9)
    ti = (taps // 3 - 1).astype(jnp.float32)[None, :, None, None]
    tj = (taps % 3 - 1).astype(jnp.float32)[None, :, None, None]
    py = jnp.clip(base_y + ti + dy, -1.0, float(h))
    px = jnp.clip(base_x + tj + dx, -1.0, float(w))
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = py - y0
    fx = px - x0
    m = jnp.moveaxis(mask.astype(jnp.float32), 3, 1)
    # (B, 9, L) flat padded index of corner 00; corners at +0/+1/+wp/+wp+1
    idx = ((y0.astype(jnp.int32) + 1) * wp +
           x0.astype(jnp.int32) + 1).reshape(b, 9, h * w)
    cw = [((1 - fy) * (1 - fx) * m).reshape(b, 9, h * w),
          ((1 - fy) * fx * m).reshape(b, 9, h * w),
          (fy * (1 - fx) * m).reshape(b, 9, h * w),
          (fy * fx * m).reshape(b, 9, h * w)]
    q = jnp.arange(lp, dtype=jnp.int32)
    mat = jnp.zeros((b, 9, h * w, lp), x.dtype)
    for c, dq in enumerate((0, 1, wp, wp + 1)):
        hit = (idx + dq)[..., None] == q
        mat = mat + jnp.where(hit, cw[c][..., None], 0.0).astype(x.dtype)
    out = jnp.einsum("btpl,btlo->bpo", mat, proj,
                     preferred_element_type=jnp.float32)
    out = out.reshape(b, h, w, cout)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                  weight: jnp.ndarray, bias: jnp.ndarray | None = None,
                  stride: int = 1, padding: int = 1,
                  dilation: int = 1, impl: str | None = None
                  ) -> jnp.ndarray:
    """Modulated deformable conv.

    Args:
      x:      (B, H, W, Cin)
      offset: (B, Ho, Wo, 2*KH*KW) — (dy, dx) interleaved per tap.
      mask:   (B, Ho, Wo, KH*KW) — already sigmoided modulation.
      weight: (KH, KW, Cin, Cout)
      bias:   (Cout,) or None
      impl:   override the 3x3/s1 small-map implementation choice:
              'onehot' | 'slot' | 'fused' | 'corner' (the per-corner
              gather reference path). Defaults to the CT_EXACT_IMPL
              env var, then to the measured-best auto choice.
    Returns (B, Ho, Wo, Cout).
    """
    kh, kw, cin, cout = weight.shape
    b, h, w, _ = x.shape
    # Slot-packed gather wins on large maps (gather-slice-count bound);
    # the gather-free onehot matmul wins on small ones, where its dense
    # (9L, Lp) matrix fits (in-model A/B on v5e at 544x960: dcn_mix
    # 46.8 fps per-corner -> 49.6 fps onehot; the gather also blocks
    # XLA fusion around it, which the per-op microbench can't see —
    # docs/dcn_levelbench.json). impl/CT_EXACT_IMPL override the
    # small-map choice (env read at trace time; engines build one
    # jitted program per process).
    if (kh, kw, stride, padding, dilation) == (3, 3, 1, 1, 1):
        if h * w >= 4096:
            return _deform_conv2d_slot(x, offset, mask, weight, bias)
        import os
        impl = impl or os.environ.get("CT_EXACT_IMPL", "")
        if impl == "fused":
            return _deform_conv2d_slot_fused(x, offset, mask, weight,
                                             bias)
        if impl == "slot":
            return _deform_conv2d_slot(x, offset, mask, weight, bias)
        if impl != "corner":
            return _deform_conv2d_onehot(x, offset, mask, weight, bias)
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y = (jnp.arange(ho, dtype=jnp.float32) * stride
              - padding)[None, :, None]
    base_x = (jnp.arange(wo, dtype=jnp.float32) * stride
              - padding)[None, None, :]

    out = jnp.zeros((b, ho, wo, cout), dtype=x.dtype)
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            dy = offset[..., 2 * t].astype(jnp.float32)
            dx = offset[..., 2 * t + 1].astype(jnp.float32)
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


def deform_conv2d_local(x: jnp.ndarray, offset: jnp.ndarray,
                        mask: jnp.ndarray, weight: jnp.ndarray,
                        bias: jnp.ndarray | None = None,
                        max_offset: int = 2,
                        train: bool = False) -> jnp.ndarray:
    """Gather-free modulated deformable conv (TPU fast path).

    Identical to `deform_conv2d` (stride 1, dilation 1) EXCEPT offsets
    are clamped to [-max_offset, +max_offset]. Bilinear sampling is
    rewritten as a sum over the (2R+3)^2 integer shifts in the clamped
    support, weighted by separable hat functions

        sample_t(y,x) = sum_{a,b} hat(py-a) * hat(px-b) * x[y+a, x+b]

    where hat(d) = max(0, 1 - |d|). Every term is a STATIC spatial
    shift (slice of a padded map) times a per-pixel scalar — pure VPU
    work + one MXU matmul per tap, no gather anywhere. Gradients flow
    to offsets through the hat weights exactly as in true bilinear
    interpolation (within the clamp).

    Support size: the clamp dy <= R makes the hat weight of shift
    ty+R+1 identically max(0, dy-R) = 0, so each axis needs only the
    2R+1 shifts [ty-R, ty+R] (verified bit-exact vs the (2R+2)-shift
    form): 9 instead of 16 shift-FMA terms per tap at R=1.

    Rationale: XLA TPU lowers per-pixel gathers to serial dynamic
    slices, which made `deform_conv2d` the inference bottleneck. Since
    models here train from scratch, training with the clamped op lets
    offsets adapt to the support; +/-2 px per level = +/-2*stride px
    in image space, which covers the offset magnitudes DCNv2 learns in
    practice.
    """
    kh, kw, cin, cout = weight.shape
    assert (kh, kw) == (3, 3), "local path supports 3x3 kernels"
    b, h, w, _ = x.shape
    r = max_offset
    pad = 1 + r  # tap reach + clamp (upper bilinear neighbor is dead)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    shift_cache = {}

    def shifted(a: int, bb: int):
        key = (a, bb)
        if key not in shift_cache:
            shift_cache[key] = jax.lax.dynamic_slice(
                xp, (0, pad + a, pad + bb, 0), (b, h, w, cin))
        return shift_cache[key]

    def sampled_tap(i: int, j: int):
        t = i * 3 + j
        ty, tx = i - 1, j - 1
        dy = jnp.clip(offset[..., 2 * t], -r, r)
        dx = jnp.clip(offset[..., 2 * t + 1], -r, r)
        m = mask[..., t]
        sampled = jnp.zeros((b, h, w, cin), dtype=x.dtype)
        for a in range(ty - r, ty + r + 1):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ty + dy - a))
            for bb in range(tx - r, tx + r + 1):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(tx + dx - bb))
                wgt = (wy * wx)
                sampled = sampled + shifted(a, bb) * \
                    wgt[..., None].astype(x.dtype)
        return sampled * m[..., None].astype(x.dtype)

    # Three equivalent contractions (same math, different schedules).
    # A/B on v5e, dla_34 544x960 (docs/train_bench.json +
    # docs/dcn_levelbench.json):
    #   - fused (one K=9*Cin matmul) wins INFERENCE at Cout >= Cin
    #     (fewer out-map accumulation passes),
    #   - premul (contract FIRST, shift-FMA on Cout channels) wins
    #     INFERENCE at Cout < Cin: the 81 hat-term shifted reads are
    #     the dominant HBM traffic of this op, and they shrink by
    #     Cin/Cout,
    #   - taploop wins TRAINING: 376.5 vs 540.1 ms/step at B=8 — the
    #     (B, H, W, 9*Cin) stacked transient must be materialized for
    #     the backward pass, and its HBM traffic beats the forward
    #     saving. Config.local_impl / CT_LOCAL_IMPL override.
    # inference default: measured per-shape on v5e at the dla_34 neck
    # shapes (/tmp-protocol in tools/dcn_levelbench.py, results in
    # docs/dcn_premul_ab.json): premul wins the channel-halving
    # modules (128->64 by ~20%) and the big stride-4 64->64 level;
    # fused wins 128->128; the stride-16/32 shapes are at the
    # dispatch-noise floor either way.
    impl = resolve_local_impl(train, cin, cout, batch=b)
    if impl == "premul":
        # Transform-first: bilinear sampling is linear in the input and
        # the (Cin, Cout) tap weight applies AT the sampled location,
        # so the matmul commutes with sampling:
        #     W_t^T sample(x, p + t + d) = sample(x @ W_t, p + t + d)
        # (zero-padding also commutes: 0 @ W_t = 0). One K=Cin matmul
        # produces all 9 per-tap transformed maps z_t, then the
        # shift-FMA runs on Cout channels instead of Cin.
        # fp32 accumulation even for bf16 features (the fused path
        # accumulates its contraction in fp32 too; the padded transient
        # is cast back to x.dtype so HBM traffic is unchanged)
        z = jnp.einsum("bhwc,tcd->bhwtd", x,
                       weight.reshape(9, cin, cout),
                       preferred_element_type=jnp.float32
                       ).astype(x.dtype)
        zp = jnp.pad(z, ((0, 0), (pad, pad), (pad, pad), (0, 0),
                         (0, 0)))
        out = jnp.zeros((b, h, w, cout), dtype=jnp.float32)
        for i in range(3):
            for j in range(3):
                t = i * 3 + j
                ty, tx = i - 1, j - 1
                dy = jnp.clip(offset[..., 2 * t], -r, r)
                dx = jnp.clip(offset[..., 2 * t + 1], -r, r)
                m = mask[..., t]
                acc = jnp.zeros((b, h, w, cout), dtype=x.dtype)
                for a in range(ty - r, ty + r + 1):
                    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ty + dy - a))
                    for bb in range(tx - r, tx + r + 1):
                        wx = jnp.maximum(
                            0.0, 1.0 - jnp.abs(tx + dx - bb))
                        zs = jax.lax.dynamic_slice(
                            zp, (0, pad + a, pad + bb, t, 0),
                            (b, h, w, 1, cout))[..., 0, :]
                        acc = acc + zs * (wy * wx)[..., None].astype(
                            x.dtype)
                out = out + (acc * m[..., None].astype(x.dtype)
                             ).astype(jnp.float32)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out.astype(x.dtype)
    if impl == "shiftfirst":
        # Loop-swapped sampling: instead of 9 per-tap hat-FMA stencils
        # (each reading (2r+1)^2 shifted views of the padded input — 81
        # operand reads of the full map at r=1, the dominant HBM
        # traffic of this op, docs/PERF.md byte budget), accumulate the
        # (B, H, W, 9, Cin) tap stack over the (2r+3)^2 ABSOLUTE
        # shifts. Each shifted read of x is then SHARED by every tap
        # whose clamped support contains that shift (up to 9), inside
        # one XLA loop fusion: 25 shifted reads instead of 81 at r=1.
        # The tail is the `fused` contraction: one K=9*Cin MXU matmul.
        dys = [jnp.clip(offset[..., 2 * t], -r, r) for t in range(9)]
        dxs = [jnp.clip(offset[..., 2 * t + 1], -r, r) for t in range(9)]
        zero = jnp.zeros((b, h, w), x.dtype)
        terms = None
        for a in range(-1 - r, 2 + r):
            for bb in range(-1 - r, 2 + r):
                lanes = []
                for i in range(3):
                    ty = i - 1
                    if not ty - r <= a <= ty + r:
                        lanes.extend([zero] * 3)
                        continue
                    for j in range(3):
                        tx = j - 1
                        if not tx - r <= bb <= tx + r:
                            lanes.append(zero)
                            continue
                        t = i * 3 + j
                        wy = jnp.maximum(0.0, 1.0 - jnp.abs(
                            ty + dys[t] - a))
                        wx = jnp.maximum(0.0, 1.0 - jnp.abs(
                            tx + dxs[t] - bb))
                        lanes.append((wy * wx * mask[..., t]
                                      ).astype(x.dtype))
                coeff = jnp.stack(lanes, axis=-1)  # (B, H, W, 9)
                term = shifted(a, bb)[..., None, :] * coeff[..., None]
                terms = term if terms is None else terms + term
        stacked = terms.reshape(b, h, w, 9 * cin)
        out = jnp.einsum("bhwk,kd->bhwd", stacked,
                         weight.reshape(9 * cin, cout),
                         preferred_element_type=jnp.float32)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out.astype(x.dtype)
    if impl == "taploop":
        # 9 thin K=Cin matmuls with an out-map accumulation between
        # each (the r1-r3 formulation; kept for A/B)
        out = jnp.zeros((b, h, w, cout), dtype=x.dtype)
        for i in range(3):
            for j in range(3):
                out = out + jnp.einsum(
                    "bhwc,cd->bhwd", sampled_tap(i, j), weight[i, j],
                    preferred_element_type=out.dtype)
        if bias is not None:
            out = out + bias
        return out

    # default: fold the 9 taps into ONE K=9*Cin MXU matmul. Versus the
    # tap loop this removes 8 elementwise accumulations over the
    # (B, H, W, Cout) out map and feeds the 128x128 systolic array a
    # full-depth contraction (K=576 at Cin=64 instead of nine K=64
    # passes), at the cost of one (B, H, W, 9*Cin) stacked transient.
    # tap axis flattens next to Cin so weight's (i, j, Cin) row-major
    # flatten lines up: k = t*Cin + c
    stacked = jnp.stack([sampled_tap(i, j) for i in range(3)
                         for j in range(3)], axis=3)
    stacked = stacked.reshape(b, h, w, 9 * cin)
    out = jnp.einsum("bhwk,kd->bhwd", stacked,
                     weight.reshape(9 * cin, cout),
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


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
