"""Pallas TPU kernel for clamped-offset DCN: halo-DMA tap-grid design.

Same math as ops/dcn.deform_conv2d_local (hat-function shift
decomposition of bilinear sampling with offsets clamped to +/-R; see
that docstring; reference semantics: the DCNv2 CUDA extension consumed
at src/lib/model/networks/dla.py:506-518).

Why this shape (third kernel design; see git history for the first
two): the environment's remote Mosaic compiler imposes three hard
limits, each established by probe (tools/pallas_probe.py):

  * kernel bodies above ~30 slice/FMA blocks crash the compile helper
    (p2 OK / p3 FAIL) -> the TAP is the innermost grid dimension, so
    each grid step runs one tap's (2R+1)^2 hat FMAs + one MXU matmul;
  * block shapes: last two dims must be (x8, x128-or-full-dim);
  * ~16 MB VMEM including double buffering -> the input can NOT be
    pre-expanded into a (2R+3)^2 shifted stack (round 2's design:
    25x HBM traffic AND vmem OOM).

So the input stays in HBM (memory_space=ARBITRARY). Each output tile
DMAs ONE haloed window (row_tile+2p, col_tile+2p) into VMEM scratch on
its first tap step; all 9 tap steps then read statically-shifted
(misaligned - probe p4/p5 proves that compiles) slices of the scratch.
The output block's index map ignores the tap index, so Pallas keeps the
fp32 accumulator resident in VMEM across the 9 steps and writes it back
once. HBM traffic is therefore x (1 + halo) reads + out writes - the
roofline - versus pure-XLA deform_conv2d_local which materializes every
tap's sampled map (~10x above roofline, measured 1.7-2.2 ms/op at
136x240x64 on v5e).

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


def _kernel(x_hbm, off_ref, mask_ref, w_ref, b_ref, out_ref, xwin, sem,
            *, r: int, row_tile: int, col_tile: int, cin: int,
            cout: int):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    t = pl.program_id(3)
    p = 1 + r

    @pl.when(t == 0)
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(i * row_tile, row_tile + 2 * p),
                     pl.ds(j * col_tile, col_tile + 2 * p), :],
            xwin, sem)
        cp.start()
        cp.wait()

    ty = t // 3 - 1
    tx = jax.lax.rem(t, 3) - 1
    dy = jnp.clip(off_ref[0, 0, :, :, 0].astype(jnp.float32), -r, r)
    dx = jnp.clip(off_ref[0, 0, :, :, 1].astype(jnp.float32), -r, r)
    m = mask_ref[0, 0, :, :, 0].astype(jnp.float32)
    sampled = jnp.zeros((row_tile, col_tile, cin), jnp.float32)
    for a in range(-r, r + 1):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - a))
        for bb in range(-r, r + 1):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - bb))
            v = xwin[pl.ds(p + ty + a, row_tile),
                     pl.ds(p + tx + bb, col_tile), :]
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


def _pick_tiles(h: int, w: int, cin: int, cout: int, r: int):
    """Full-width tiles; rows chosen so scratch+out fit comfortably in
    VMEM (<= ~2 MB each with double buffering headroom)."""
    budget = 2 * 1024 * 1024
    rt = max(8, min(h, budget // max(1, w * cout * 4)))
    # row_tile is a third-from-last block dim (unconstrained), but keep
    # the tile count integral by rounding h up to a multiple below.
    return rt, w


def _forward(x, offset, mask, weight, bias, max_offset, row_tile,
             col_tile, interpret):
    kh, kw, cin, cout = weight.shape
    assert (kh, kw) == (3, 3)
    b, h, w, _ = x.shape
    r = max_offset
    p = 1 + r
    if row_tile is None or col_tile is None:
        row_tile, col_tile = _pick_tiles(h, w, cin, cout, r)

    hp = (-h) % row_tile
    wp = (-w) % col_tile
    ht, wt = h + hp, w + wp
    xpad = jnp.pad(x, ((0, 0), (p, p + hp), (p, p + wp), (0, 0)))
    if hp or wp:
        # zero mask in the pad region zeroes its (garbage) samples
        offset = jnp.pad(offset, ((0, 0), (0, hp), (0, wp), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, hp), (0, wp), (0, 0)))

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
                          col_tile=col_tile, cin=cin, cout=cout),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
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
        scratch_shapes=[
            pltpu.VMEM((row_tile + 2 * p, col_tile + 2 * p, cin),
                       x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xpad, off5, mask5, w9, bias_arr)
    return out[:, :h, :w].astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def deform_conv2d_local_halo(x, offset, mask, weight, bias=None,
                             max_offset: int = 1,
                             row_tile: int | None = None,
                             col_tile: int | None = None,
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


deform_conv2d_local_halo.defvjp(_fwd, _bwd)
