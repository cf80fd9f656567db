"""Pallas TPU kernel for the clamped-offset DCN (tap-grid design).

Same math as ops/dcn.deform_conv2d_local (hat-function shift
decomposition of bilinear sampling with offsets clamped to +/-R; see
that docstring; reference semantics: the DCNv2 CUDA extension consumed
at src/lib/model/networks/dla.py:506-518).

Why this shape: the environment's remote Mosaic compiler crashes
(HTTP 500) on any kernel body above roughly 30 slice/FMA blocks
(tools/pallas_probe.py p2 OK / p3 FAIL), which killed both round 1's
fused kernel and a single-body pre-shifted design. Misaligned slices
and small FMA chains compile fine. So the kernel is structured as:

  * XLA pre-builds the (2R+3)^2 statically-shifted copies of the padded
    input (the same dynamic-slices deform_conv2d_local takes);
  * grid = (B, H/row_tile, W/col_tile, 9) with the TAP as the innermost
    (reduction) dimension: each grid step runs only one tap's
    (2R+1)^2 hat-weighted FMAs + one (Cin, Cout) MXU contraction —
    well under the crash threshold — and accumulates into the output
    block, which Pallas keeps resident in VMEM across the 9 tap steps;
  * the shifted stack block's index map ignores the tap index, so the
    ~6 MB stack tile is fetched once per output tile, not per tap.

vs. pure-XLA deform_conv2d_local the win is fusion: XLA materializes
each tap's sampled map to HBM (~2.2 ms/op at 136x240x64, ~10x above
the HBM roofline); here the whole chain stays in VMEM.

Differentiable: jax.custom_vjp with the backward pass taken from the
XLA formulation (recompute-style), so the kernel is a drop-in for
training too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from centertrack_tpu.ops.dcn import deform_conv2d_local


def _kernel(xs_ref, off_ref, mask_ref, w_ref, b_ref, out_ref, *,
            r: int, row_tile: int, col_tile: int, cin: int, cout: int,
            d: int):
    t = pl.program_id(3)
    ty = t // 3 - 1
    tx = jax.lax.rem(t, 3) - 1
    dy = jnp.clip(off_ref[0, 0, :, :, 0].astype(jnp.float32), -r, r)
    dx = jnp.clip(off_ref[0, 0, :, :, 1].astype(jnp.float32), -r, r)
    m = mask_ref[0, 0, :, :, 0].astype(jnp.float32)
    sampled = jnp.zeros((row_tile, col_tile, cin), jnp.float32)
    for a in range(-r, r + 1):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - a))
        for b in range(-r, r + 1):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - b))
            s = (ty + a + r + 1) * d + (tx + b + r + 1)
            v = xs_ref[0, s]
            sampled = sampled + v.astype(jnp.float32) * \
                (wy * wx)[..., None]
    sampled = sampled * m[..., None]
    contrib = jnp.dot(
        sampled.reshape(row_tile * col_tile, cin).astype(w_ref.dtype),
        w_ref[0], preferred_element_type=jnp.float32,
    ).reshape(row_tile, col_tile, cout)

    @pl.when(t == 0)
    def _():
        out_ref[0] = b_ref[0, 0].astype(jnp.float32) + contrib

    @pl.when(t > 0)
    def _():
        out_ref[0] = out_ref[0] + contrib


def _forward(x, offset, mask, weight, bias, max_offset, row_tile,
             col_tile, interpret):
    kh, kw, cin, cout = weight.shape
    assert (kh, kw) == (3, 3)
    b, h, w, _ = x.shape
    r = max_offset
    p = 1 + r
    d = 2 * r + 3

    hp = (-h) % row_tile
    wp = (-w) % col_tile
    ht, wt = h + hp, w + wp
    xpad = jnp.pad(x, ((0, 0), (p, p + hp), (p, p + wp), (0, 0)))
    if hp or wp:
        offset = jnp.pad(offset, ((0, 0), (0, hp), (0, wp), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, hp), (0, wp), (0, 0)))

    # (B, D*D, Ht, Wt, C) stack of statically shifted views
    xs = jnp.stack([
        jax.lax.dynamic_slice(xpad, (0, a, bb, 0), (b, ht, wt, cin))
        for a in range(d) for bb in range(d)], axis=1)
    # tap-major offset/mask layouts so each grid step gets its tap's
    # channels via the index map (no in-kernel lane slicing)
    off5 = offset.reshape(b, ht, wt, 9, 2).transpose(0, 3, 1, 2, 4)
    mask5 = mask.reshape(b, ht, wt, 9, 1).transpose(0, 3, 1, 2, 4)

    w9 = weight.reshape(9, cin, cout)
    bias_arr = (bias if bias is not None
                else jnp.zeros((cout,), jnp.float32))
    bias_arr = bias_arr.astype(jnp.float32).reshape(1, 1, cout)

    grid = (b, ht // row_tile, wt // col_tile, 9)
    out = pl.pallas_call(
        functools.partial(_kernel, r=r, row_tile=row_tile,
                          col_tile=col_tile, cin=cin, cout=cout, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d * d, row_tile, col_tile, cin),
                         lambda bi, i, j, t: (bi, 0, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, row_tile, col_tile, 2),
                         lambda bi, i, j, t: (bi, t, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, row_tile, col_tile, 1),
                         lambda bi, i, j, t: (bi, t, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin, cout),
                         lambda bi, i, j, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cout),
                         lambda bi, i, j, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, row_tile, col_tile, cout),
                               lambda bi, i, j, t: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ht, wt, cout), jnp.float32),
        interpret=interpret,
    )(xs, off5, mask5, w9, bias_arr)
    return out[:, :h, :w].astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def deform_conv2d_local_pallas(x, offset, mask, weight, bias=None,
                               max_offset: int = 1, row_tile: int = 8,
                               col_tile: int = 120,
                               interpret: bool = False):
    """Drop-in for deform_conv2d_local (3x3, stride 1, dilation 1).

    x: (B, H, W, Cin); offset: (B, H, W, 18) (dy, dx interleaved);
    mask: (B, H, W, 9) sigmoided; weight: (3, 3, Cin, Cout).
    """
    return _forward(x, offset, mask, weight, bias, max_offset,
                    row_tile, col_tile, interpret)


def _fwd(x, offset, mask, weight, bias, max_offset, row_tile, col_tile,
         interpret):
    out = _forward(x, offset, mask, weight, bias, max_offset, row_tile,
                   col_tile, interpret)
    return out, (x, offset, mask, weight, bias)


def _bwd(max_offset, row_tile, col_tile, interpret, res, g):
    x, offset, mask, weight, bias = res
    has_bias = bias is not None

    def ref(x, offset, mask, weight, bias):
        return deform_conv2d_local(
            x, offset, mask, weight, bias if has_bias else None,
            max_offset=max_offset)

    _, vjp = jax.vjp(ref, x, offset, mask, weight,
                     bias if has_bias else jnp.zeros(
                         (weight.shape[-1],), x.dtype))
    gx, goff, gmask, gw, gb = vjp(g)
    return gx, goff, gmask, gw, (gb if has_bias else None)


deform_conv2d_local_pallas.defvjp(_fwd, _bwd)
