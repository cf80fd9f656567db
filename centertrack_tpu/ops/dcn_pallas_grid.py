"""Pallas TPU kernel for the clamped deformable conv — TAP-AS-GRID shape.

Round-4 Mosaic retry (VERDICT r3 item 8). The production-shaped kernel
(ops/dcn_pallas.py: all 9 taps' shift-FMA blocks in one kernel body)
crashes the remote Mosaic compiler, as do per-tap *splits* into
separate pallas_calls. This variant expresses the tap loop as the
INNERMOST GRID DIMENSION instead — one tap per grid step, each step:

  * t == 0: DMA the (row_tile + 2*pad)-row input window HBM -> VMEM
    scratch and zero the f32 accumulator (both persist across the tap
    steps of the same (batch, tile) block),
  * build ONE tap's sampled+modulated activation from (2r+1)^2
    dynamically-offset window slices (the tap's kernel position enters
    through pl.ds starts computed from pl.program_id, so the body has
    only ~9 FMA blocks at r=1 — inside the size range the probes show
    compiling),
  * accumulate its (Cin, Cout) contraction on the MXU,
  * t == 8: add bias and write the output block once.

Same math as ops/dcn.deform_conv2d_local (hat-function bilinear with
offsets clamped to +/-r). Replaces the reference's CUDA DCNv2
(reference: src/lib/model/networks/DCNv2, consumed at dla.py:513).

STATUS — FINAL (round 4, experiment retired): interpret-mode verified
(tests/test_dcn_pallas.py), but the remote Mosaic toolchain rejects
this shape too (docs/pallas_probe_r4.json): the tiny 16x24x8 case gets
the same opaque remote_compile HTTP 500 as every earlier attempt, and
the stride-8 production shape CRASHED THE TPU WORKER PROCESS
(UNAVAILABLE, ~5 min recovery). Four program shapes over four rounds —
monolithic 9-tap body, per-tap pallas_call splits, one-shift-per-kernel
splits, and this tap-as-grid accumulator — all fail identically while
every sub-dozen-FMA probe compiles, confirming a toolchain limit, not a
kernel-design one. The production DCN paths remain the pure-XLA
formulations in ops/dcn.py (fat-matmul local, slot gather, onehot
matmul), which already beat the reference's FPS target. Do not re-probe
casually: the failing compile can take the TPU worker down with it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, off_ref, mask_ref, w_ref, b_ref, out_ref, xwin, acc,
            sem, *, row_tile: int, width: int, pad: int, r: int,
            cin: int, cout: int):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    t = pl.program_id(2)
    row0 = i * row_tile  # window origin in padded-row coordinates

    @pl.when(t == 0)
    def _load():
        copy = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(row0, row_tile + 2 * pad), :, :],
            xwin, sem)
        copy.start()
        copy.wait()
        acc[...] = jnp.zeros_like(acc)

    # tap kernel position from the grid index (dy first: channel 2t is
    # dy, 2t+1 dx — upstream DCNv2 channel order)
    ty = t // 3 - 1
    tx = t % 3 - 1
    dy = jnp.clip(off_ref[0, 0], -r, r)          # (row_tile, width)
    dx = jnp.clip(off_ref[0, 1], -r, r)
    m = mask_ref[0, 0]

    sampled = jnp.zeros((row_tile, width, cin), jnp.float32)
    for a in range(-r, r + 1):                   # static shift offsets
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - a))
        for b in range(-r, r + 1):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - b))
            seg = xwin[pl.ds(ty + a + pad, row_tile),
                       pl.ds(tx + b + pad, width), :]
            sampled = sampled + seg.astype(jnp.float32) * \
                (wy * wx)[..., None]
    sampled = sampled * m[..., None]
    acc[...] += jnp.dot(sampled.reshape(row_tile * width, cin),
                        w_ref[0].astype(jnp.float32),
                        preferred_element_type=jnp.float32)

    @pl.when(t == 8)
    def _store():
        out = acc[...] + b_ref[:]
        out_ref[0, :, :, :] = out.reshape(
            row_tile, width, cout).astype(out_ref.dtype)


def deform_conv2d_pallas_grid(x: jnp.ndarray, offset: jnp.ndarray,
                              mask: jnp.ndarray, weight: jnp.ndarray,
                              bias: jnp.ndarray | None = None,
                              max_offset: int = 1, row_tile: int = 8,
                              interpret: bool = False) -> jnp.ndarray:
    """Drop-in for deform_conv2d_local (3x3, stride 1, dilation 1).

    x: (B, H, W, Cin); offset: (B, H, W, 18) interleaved (dy, dx) per
    tap; mask: (B, H, W, 9); weight: (3, 3, Cin, Cout).
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
    # channel-major layouts so each tap's slab is a BLOCK, not an
    # in-kernel dynamic lane slice: offset (B, 18, H, W) blocked (2) on
    # dim 1; mask (B, 9, H, W) blocked (1)
    off_cm = jnp.moveaxis(offset, -1, 1)
    mask_cm = jnp.moveaxis(mask, -1, 1)
    w9 = weight.reshape(9, cin, cout)
    bias_arr = (bias if bias is not None
                else jnp.zeros((cout,), x.dtype)).astype(jnp.float32)

    grid = (b, hp // row_tile, 9)
    out = pl.pallas_call(
        functools.partial(
            _kernel, row_tile=row_tile, width=w, pad=pad, r=r,
            cin=cin, cout=cout),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # stays in HBM
            pl.BlockSpec((1, 2, row_tile, w),
                         lambda bi, i, t: (bi, t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, row_tile, w),
                         lambda bi, i, t: (bi, t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin, cout), lambda bi, i, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda bi, i, t: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, row_tile, w, cout),
                               lambda bi, i, t: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((row_tile + 2 * pad, w + 2 * pad, cin), x.dtype),
            pltpu.VMEM((row_tile * w, cout), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, off_cm, mask_cm, w9, bias_arr)
    return out[:, :h]
