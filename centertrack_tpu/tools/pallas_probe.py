"""Escalating Pallas/Mosaic probes for the DCN kernel on the real TPU.

Round-1/2 found the remote Mosaic compiler crashing (HTTP 500, no
diagnostics) on the fused DCN kernel and on most bisected fragments.
This probe suite isolates the failing constructs one at a time so each
toolchain update can be re-checked cheaply, and so the production kernel
can be designed around whatever still crashes:

  p0  trivial copy (sanity)
  p1  12 aligned-block FMAs + 1 matmul
  p2  ~30 aligned FMAs
  p3  full R=1 tap loop on a PRE-SHIFTED aligned stack (81 FMAs, 9 matmuls)
  p4  misaligned SUBLANE slice read (x[1:1+8, :, :])
  p5  misaligned LANE slice read (x[:, 3:3+128])
  p6  in-kernel vector gather (jnp.take along axis 0)
  p7  the real deform_conv2d_pallas (row_tile 8) at 64x128x64
  p8  pre-shifted-stack local DCN kernel (the misalignment-free design)

Usage: python -m centertrack_tpu.tools.pallas_probe [out.json]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def p0_copy():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0
    x = jnp.ones((16, 128), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


def _fma_kernel(n):
    def k(x_ref, w_ref, o_ref):
        acc = jnp.zeros_like(x_ref[0], dtype=jnp.float32)
        for i in range(n):
            acc = acc + x_ref[i % x_ref.shape[0]].astype(jnp.float32) * \
                w_ref[0, i % 8]
        o_ref[:] = jnp.dot(acc, jnp.eye(acc.shape[-1], dtype=jnp.float32),
                           preferred_element_type=jnp.float32)
    return k


def _fma(n):
    x = jnp.ones((8, 16, 128), jnp.bfloat16)
    w = jnp.ones((1, 8), jnp.float32)
    return pl.pallas_call(
        _fma_kernel(n),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, w)


def p1_fma12():
    return _fma(12)


def p2_fma30():
    return _fma(30)


def p3_tap_loop():
    """R=1 local-DCN structure on an aligned pre-shifted stack:
    9 taps x 9 shift-FMAs + 9 matmuls, no misaligned slicing."""
    tr, w, cin, cout = 8, 128, 64, 64

    def k(xs_ref, hy_ref, hx_ref, m_ref, w_ref, o_ref):
        acc = jnp.zeros((tr * w, cout), jnp.float32)
        for t in range(9):
            ty, tx = t // 3 - 1, t % 3 - 1
            sampled = jnp.zeros((tr, w, cin), jnp.float32)
            for a in range(3):
                for b in range(3):
                    s = (ty + a) * 5 + (tx + b) + 12  # shift index in 5x5
                    wgt = hy_ref[t, a] * hx_ref[t, b]
                    sampled = sampled + xs_ref[s].astype(jnp.float32) * \
                        wgt[..., None]
            sampled = sampled * m_ref[t][..., None]
            acc = acc + jnp.dot(sampled.reshape(tr * w, cin),
                                w_ref[t].astype(jnp.float32),
                                preferred_element_type=jnp.float32)
        o_ref[:] = acc.reshape(tr, w, cout).astype(o_ref.dtype)

    xs = jnp.ones((25, tr, w, cin), jnp.bfloat16)
    hy = jnp.ones((9, 3, tr, w), jnp.float32)
    hx = jnp.ones((9, 3, tr, w), jnp.float32)
    m = jnp.ones((9, tr, w), jnp.float32)
    wt = jnp.ones((9, cin, cout), jnp.bfloat16)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((tr, w, cout), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
        xs, hy, hx, m, wt)


def p4_sublane_slice():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[1:9, :, :] + x_ref[3:11, :, :]
    x = jnp.ones((16, 128, 8), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


def p5_lane_slice():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:, 3:3 + 128] + x_ref[:, 5:5 + 128]
    x = jnp.ones((16, 256), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


def p6_gather():
    def k(tab_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)
    tab = jnp.ones((512, 128), jnp.bfloat16)
    idx = jnp.zeros((256,), jnp.int32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tab, idx)


def p7_dcn_pallas():
    from centertrack_tpu.ops.dcn_pallas import deform_conv2d_pallas
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 128, 64), jnp.bfloat16)
    off = jnp.asarray(rng.randn(1, 64, 128, 18), jnp.bfloat16)
    mask = jnp.asarray(rng.rand(1, 64, 128, 9), jnp.bfloat16)
    wt = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.bfloat16)
    return deform_conv2d_pallas(x, off, mask, wt, max_offset=1)


def p8_preshift_local():
    """Misalignment-free local-DCN tile kernel: XLA pre-shifts the 25
    R=1 support copies; the kernel does only aligned FMA + matmul."""
    from centertrack_tpu.ops.dcn_pallas_shift import (
        deform_conv2d_local_pallas)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 128, 64), jnp.bfloat16)
    off = jnp.asarray(rng.randn(1, 64, 128, 18), jnp.bfloat16)
    mask = jnp.asarray(rng.rand(1, 64, 128, 9), jnp.bfloat16)
    wt = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.bfloat16)
    return deform_conv2d_local_pallas(x, off, mask, wt, max_offset=1,
                                      col_tile=128)


PROBES = [p0_copy, p1_fma12, p2_fma30, p3_tap_loop, p4_sublane_slice,
          p5_lane_slice, p6_gather, p7_dcn_pallas, p8_preshift_local]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/pallas_probe.json"
    results = {}
    for fn in PROBES:
        name = fn.__name__
        t0 = time.time()
        try:
            r = fn()
            np.asarray(jax.tree_util.tree_leaves(r)[0])
            results[name] = f"OK ({time.time() - t0:.1f}s)"
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL {type(e).__name__}: {e}"[:300]
        print(f"{name}: {results[name]}", file=sys.stderr, flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
