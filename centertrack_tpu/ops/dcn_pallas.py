"""Pallas TPU kernel for the clamped-offset modulated deformable conv.

Same math as ops/dcn.deform_conv2d_local (exact bilinear sampling with
offsets clamped to +/-R, hat-function shift decomposition — see that
docstring), fused into ONE kernel per row-tile:

  * the padded input stays in HBM; each grid step DMAs just its
    (row_tile + 2*pad)-row window into a VMEM scratch (double-buffer-
    friendly ~1 MB, vs. the naive full-map VMEM block whose 2x
    pipelining exceeded the 16 MB VMEM budget),
  * the 9 taps' sampled+modulated activations are built from static
    shifted slices of the window (VPU) and contracted with the
    (Cin, Cout) tap weights on the MXU,
  * one HBM write of the output tile.

Replaces the reference's CUDA DCNv2 extension
(reference: src/lib/model/networks/DCNv2 submodule, consumed at
dla.py:513, resdcn.py:244, necks/msraup.py:104).

STATUS: interpret-mode verified against deform_conv2d_local (exact
parity, see tests/test_dcn_pallas.py). The remote Mosaic compiler in
this development environment crashes (HTTP 500, no diagnostics) on any
kernel above ~a-dozen slice-FMA blocks — bisected across plain blocks,
offset sublane slices and pltpu.roll, so it is a toolchain limit, not a
kernel construct. Re-verified in round 2: per-tap and even
one-shift-per-kernel splits of this kernel (R=1, 16/8/4/1 shift-FMA
blocks per pallas_call) all crash identically, so splitting below the
block threshold does not help either. Re-retried in round 3
(tools/pallas_probe, docs/pallas_probe_r3.json): p0-p2/p4/p5 (copies,
<=30 FMAs, misaligned sublane/lane slices) compile; the tap-loop (p3),
the production kernel (p7) and the pre-shifted local kernel (p8) still
crash with the same opaque HTTP 500. Round 4 (FINAL): the
tap-as-grid-dimension shape (ops/dcn_pallas_grid.py) fails identically
even at 16x24x8, and its stride-8 case crashed the TPU worker process
(docs/pallas_probe_r4.json) — experiment retired.
ops/dcn.deform_conv2d_local is the production path (the whole-model
XLA graph fuses it well: 14.6 ms forward+decode at 544x960); swap a
fused kernel in when the Mosaic stack updates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, off_ref, mask_ref, w_ref, b_ref, out_ref, xwin, sem,
            *, row_tile: int, width: int, pad: int, r: int, cin: int,
            cout: int):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * row_tile  # window origin in padded-row coordinates

    copy = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(row0, row_tile + 2 * pad), :, :],
        xwin, sem)
    copy.start()
    copy.wait()

    acc = jnp.zeros((row_tile * width, cout), jnp.float32)
    for t in range(9):
        ty, tx = t // 3 - 1, t % 3 - 1
        dy = jnp.clip(off_ref[0, :, :, 2 * t], -r, r)        # TR, W
        dx = jnp.clip(off_ref[0, :, :, 2 * t + 1], -r, r)
        m = mask_ref[0, :, :, t]
        sampled = jnp.zeros((row_tile, width, cin), jnp.float32)
        for a in range(ty - r, ty + r + 1):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ty + dy - a))
            rows = xwin[a + pad: a + pad + row_tile, :, :]
            for b in range(tx - r, tx + r + 1):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(tx + dx - b))
                seg = rows[:, b + pad: b + pad + width, :]
                sampled = sampled + seg.astype(jnp.float32) * \
                    (wy * wx)[..., None]
        sampled = sampled * m[..., None]
        acc = acc + jnp.dot(
            sampled.reshape(row_tile * width, cin),
            w_ref[t].astype(jnp.float32),
            preferred_element_type=jnp.float32)
    out = acc + b_ref[:]
    out_ref[0, :, :, :] = out.reshape(row_tile, width, cout).astype(
        out_ref.dtype)


def deform_conv2d_pallas(x: jnp.ndarray, offset: jnp.ndarray,
                         mask: jnp.ndarray, weight: jnp.ndarray,
                         bias: jnp.ndarray | None = None,
                         max_offset: int = 2, row_tile: int = 8,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in for deform_conv2d_local (3x3, stride 1, dilation 1).

    x: (B, H, W, Cin); offset: (B, H, W, 18); mask: (B, H, W, 9);
    weight: (3, 3, Cin, Cout).
    """
    kh, kw, cin, cout = weight.shape
    assert (kh, kw) == (3, 3)
    b, h, w, _ = x.shape
    r = max_offset
    pad = 1 + r
    h_pad = (-h) % row_tile
    xp = jnp.pad(x, ((0, 0), (pad, pad + h_pad), (pad, pad), (0, 0)))
    if h_pad:
        offset = jnp.pad(offset, ((0, 0), (0, h_pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, h_pad), (0, 0), (0, 0)))
    hp = h + h_pad
    w9 = weight.reshape(9, cin, cout)
    bias_arr = (bias if bias is not None
                else jnp.zeros((cout,), x.dtype)).astype(jnp.float32)

    grid = (b, hp // row_tile)
    out = pl.pallas_call(
        functools.partial(
            _kernel, row_tile=row_tile, width=w, pad=pad, r=r,
            cin=cin, cout=cout),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # stays in HBM
            pl.BlockSpec((1, row_tile, w, 18),
                         lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row_tile, w, 9),
                         lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda bi, i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, row_tile, w, cout),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((row_tile + 2 * pad, w + 2 * pad, cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, offset, mask, w9, bias_arr)
    return out[:, :h]
