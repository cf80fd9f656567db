"""Microbenchmark of exact-DCN gather formulations on the real TPU.

The exact `dcn` node (reference: src/lib/model/networks/dla.py:506-518)
is gather-bound on TPU: VERDICT r2 measured 34.7 fps vs 68.6 fps for the
clamped local path, i.e. ~14 ms/frame of gather cost across the ~10 DCN
layers. This tool times candidate formulations of the deformable
bilinear gather at the two dominant shapes (stride-4: 136x240x64,
stride-8: 68x120x128 at MOT17 544x960) so the production op can pick the
fastest one on real hardware.

Usage:  python -m centertrack_tpu.tools.dcn_microbench [out.json]
Writes one JSON dict {variant: ms} per shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import jax.numpy as jnp
import numpy as np

from centertrack_tpu.ops.dcn import (_corner_slots, _deform_conv2d_slot,
                                     bilinear_sample, deform_conv2d_local)


def _tap_positions(h, w, offset, i, j, t):
    base_y = jnp.arange(h, dtype=jnp.float32)[:, None]
    base_x = jnp.arange(w, dtype=jnp.float32)[None, :]
    py = base_y + (i - 1) + offset[0, ..., 2 * t].astype(jnp.float32)
    px = base_x + (j - 1) + offset[0, ..., 2 * t + 1].astype(jnp.float32)
    py = jnp.clip(py, -1.0, float(h))
    px = jnp.clip(px, -1.0, float(w))
    return py, px


def _corner_weights(py, px, m):
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = py - y0
    fx = px - x0
    cw = jnp.stack([(1 - fy) * (1 - fx), (1 - fy) * fx,
                    fy * (1 - fx), fy * fx], -1) * m[..., None]
    return y0.astype(jnp.int32), x0.astype(jnp.int32), cw


def dcn_slot9(x, offset, mask, weight, bias):
    """Current production path: per-tap slot gather + per-tap matmul."""
    return _deform_conv2d_slot(x, offset, mask, weight, bias)


def dcn_im2col(x, offset, mask, weight, bias, take_mode="clip"):
    """ONE fused gather for all 9 taps + ONE im2col matmul."""
    b, h, w, cin = x.shape
    cout = weight.shape[-1]
    wp = w + 3
    xc = _corner_slots(x)[0]  # (L, 4C), B=1
    idxs, cws = [], []
    for i in range(3):
        for j in range(3):
            t = i * 3 + j
            py, px = _tap_positions(h, w, offset, i, j, t)
            m = mask[0, ..., t].astype(jnp.float32)
            y0, x0, cw = _corner_weights(py, px, m)
            idxs.append(((y0 + 1) * wp + x0 + 1).reshape(-1))
            cws.append(cw.reshape(-1, 4))
    idx_all = jnp.concatenate(idxs)
    cw_all = jnp.stack(cws)
    vals = jnp.take(xc, idx_all, axis=0, mode=take_mode)
    vals = vals.reshape(9, h * w, 4, cin)
    sampled = jnp.einsum("thsc,ths->thc", vals, cw_all,
                         preferred_element_type=jnp.float32).astype(x.dtype)
    col = sampled.transpose(1, 0, 2).reshape(h * w, 9 * cin)
    out = jnp.dot(col, weight.reshape(9 * cin, cout),
                  preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.reshape(1, h, w, cout).astype(x.dtype)


def dcn_flat9(x, offset, mask, weight, bias):
    """Per-tap gather but batch-free flat indexing (no take_along_axis)."""
    b, h, w, cin = x.shape
    cout = weight.shape[-1]
    wp = w + 3
    xc = _corner_slots(x)[0]
    out = jnp.zeros((h * w, cout), jnp.float32)
    for i in range(3):
        for j in range(3):
            t = i * 3 + j
            py, px = _tap_positions(h, w, offset, i, j, t)
            m = mask[0, ..., t].astype(jnp.float32)
            y0, x0, cw = _corner_weights(py, px, m)
            idx = ((y0 + 1) * wp + x0 + 1).reshape(-1)
            vals = jnp.take(xc, idx, axis=0, mode="clip")
            vals = vals.reshape(h * w, 4, cin)
            sampled = jnp.einsum("hsc,hs->hc", vals, cw.reshape(-1, 4),
                                 preferred_element_type=jnp.float32
                                 ).astype(x.dtype)
            out = out + jnp.dot(sampled, weight[i, j],
                                preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.reshape(1, h, w, cout).astype(x.dtype)


def dcn_corner4(x, offset, mask, weight, bias):
    """Per-corner gather from the UNPACKED padded map (4x smaller table
    that may stay VMEM-resident; 4x more gathers of C-wide slices)."""
    b, h, w, cin = x.shape
    cout = weight.shape[-1]
    wp = w + 3
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))[0].reshape(-1, cin)
    out = jnp.zeros((h * w, cout), jnp.float32)
    for i in range(3):
        for j in range(3):
            t = i * 3 + j
            py, px = _tap_positions(h, w, offset, i, j, t)
            m = mask[0, ..., t].astype(jnp.float32)
            y0, x0, cw = _corner_weights(py, px, m)
            base = ((y0 + 1) * wp + x0 + 1).reshape(-1)
            cwf = cw.reshape(-1, 4)
            sampled = jnp.zeros((h * w, cin), jnp.float32)
            for s, d in enumerate((0, 1, wp, wp + 1)):
                v = jnp.take(xp, base + d, axis=0, mode="clip")
                sampled = sampled + v.astype(jnp.float32) * cwf[:, s:s + 1]
            out = out + jnp.dot(sampled.astype(x.dtype), weight[i, j],
                                preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.reshape(1, h, w, cout).astype(x.dtype)


def dcn_gather_legacy(x, offset, mask, weight, bias):
    """Round-1 per-corner bilinear_sample path (take_along_axis)."""
    b, h, w, cin = x.shape
    cout = weight.shape[-1]
    base_y = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    base_x = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    out = jnp.zeros((b, h, w, cout), dtype=x.dtype)
    for i in range(3):
        for j in range(3):
            t = i * 3 + j
            py = base_y + (i - 1) + offset[..., 2 * t].astype(jnp.float32)
            px = base_x + (j - 1) + offset[..., 2 * t + 1].astype(jnp.float32)
            sampled = bilinear_sample(x, py, px)
            sampled = sampled * mask[..., t][..., None]
            out = out + jnp.einsum("bhwc,cd->bhwd", sampled, weight[i, j],
                                   preferred_element_type=out.dtype)
    return out + bias


def make_local(r):
    def f(x, offset, mask, weight, bias):
        return deform_conv2d_local(x, offset, mask, weight, bias,
                                   max_offset=r)
    return f


VARIANTS = {
    "slot9": dcn_slot9,
    "im2col": dcn_im2col,
    "im2col_pib": lambda *a: dcn_im2col(*a, take_mode="promise_in_bounds"),
    "flat9": dcn_flat9,
    "corner4": dcn_corner4,
    "legacy_tab": dcn_gather_legacy,
    "local1": make_local(1),
    "local2": make_local(2),
}


def bench_shape(h, w, cin, cout, dtype, iters=30):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, h, w, cin), dtype)
    offset = jnp.asarray(rng.randn(1, h, w, 18) * 2.0, dtype)
    mask = jax.nn.sigmoid(jnp.asarray(rng.randn(1, h, w, 9), dtype))
    weight = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, dtype)
    bias = jnp.zeros((cout,), dtype)
    results = {}
    ref = None
    for name, fn in VARIANTS.items():
        jf = jax.jit(
            lambda *a, fn=fn: jnp.sum(jnp.abs(fn(*a).astype(jnp.float32))))
        try:
            r = jf(x, offset, mask, weight, bias)
            v = float(np.asarray(r))
            for _ in range(3):
                r = jf(x, offset, mask, weight, bias)
            np.asarray(r)
            t0 = time.time()
            for _ in range(iters):
                r = jf(x, offset, mask, weight, bias)
            np.asarray(r)
            ms = (time.time() - t0) / iters * 1e3
            results[name] = round(ms, 3)
            if name == "slot9":
                ref = v
            elif ref is not None and not name.startswith("local"):
                if not np.isclose(v, ref, rtol=2e-2):
                    results[name + "_MISMATCH"] = [v, ref]
        except Exception as e:  # noqa: BLE001
            results[name] = f"ERROR: {type(e).__name__}: {e}"[:200]
        print(f"  {name}: {results[name]}", file=sys.stderr, flush=True)
    return results


def bench_raw_gather(iters=30):
    """Raw jnp.take slice-throughput sweep: table (L, W) bf16, N idx."""
    rng = np.random.RandomState(0)
    out = {}
    L = 139 * 243
    for width in (64, 128, 256, 512):
        for n in (32640 * 9,):
            table = jnp.asarray(rng.randn(L, width), jnp.bfloat16)
            idx = jnp.asarray(rng.randint(0, L, n), jnp.int32)
            jf = jax.jit(lambda t, i: jnp.sum(
                jnp.take(t, i, axis=0, mode="clip").astype(jnp.float32)))
            r = jf(table, idx)
            np.asarray(r)
            t0 = time.time()
            for _ in range(iters):
                r = jf(table, idx)
            np.asarray(r)
            ms = (time.time() - t0) / iters * 1e3
            out[f"take_w{width}_n{n}"] = round(ms, 3)
            print(f"  take w={width} n={n}: {ms:.3f} ms "
                  f"({n / ms * 1e3 / 1e6:.0f} Mslices/s)",
                  file=sys.stderr, flush=True)
    return out


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/dcn_microbench.json"
    print(f"backend: {jax.devices()}", file=sys.stderr)
    report = {"device": str(jax.devices()[0])}
    print("raw gather sweep:", file=sys.stderr)
    report["raw_gather"] = bench_raw_gather()
    for (h, w, cin, cout) in ((136, 240, 64, 64), (68, 120, 128, 128)):
        key = f"{h}x{w}x{cin}"
        print(f"shape {key}:", file=sys.stderr)
        report[key] = bench_shape(h, w, cin, cout, jnp.bfloat16)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
