"""Per-level TPU microbench of the DCN node implementations.

Times every DCN implementation (exact gather `deform_conv2d`, slot and
per-corner variants, clamped `deform_conv2d_local` r=1/2/3) at each DLA
neck map shape of a 544x960 input, in the production dtype. The output
drives the per-level node-mixing decision for the exact `dcn` path
(reference op being accelerated: the DCNv2 CUDA extension consumed at
src/lib/model/networks/dla.py:506-518).

Writes one JSON dict to --out (default /tmp/dcn_levelbench.json).

Timing note: block_until_ready does not sync through the axon tunnel —
a forced np.asarray() transfer is the fence (CLAUDE.md).
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from centertrack_tpu.ops.dcn import (_deform_conv2d_onehot,
                                     _deform_conv2d_slot,
                                     _deform_conv2d_slot_fused,
                                     deform_conv2d,
                                     deform_conv2d_local)

# (H, W, Cin, Cout, count) — DCN ops per neck level for dla_34 at
# 544x960; counts from models/dla.py DLAUp+IDAUp wiring.
SHAPES = [
    (136, 240, 64, 64),    # x5 in dla_34
    (68, 120, 128, 64),    # x4
    (68, 120, 128, 128),   # x2
    (34, 60, 256, 256),    # x1
    (34, 60, 256, 128),    # x2
    (34, 60, 256, 64),     # x1
    (17, 30, 512, 256),    # x1
]


def _with_impl(impl, fn, *args, **kwargs):
    import os
    prev = os.environ.get("CT_LOCAL_IMPL")
    os.environ["CT_LOCAL_IMPL"] = impl
    try:
        return fn(*args, **kwargs)
    finally:
        if prev is None:
            os.environ.pop("CT_LOCAL_IMPL", None)
        else:
            os.environ["CT_LOCAL_IMPL"] = prev


def timeit(fn, *args, iters=50):
    out = fn(*args)
    np.asarray(out[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/dcn_levelbench.json")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--offset_scale", type=float, default=1.0)
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)

    res = {"device": str(jax.devices()[0]), "dtype": args.dtype}
    rng = np.random.RandomState(0)
    for h, w, cin, cout in SHAPES:
        key = f"{h}x{w}x{cin}->{cout}"
        res[key] = {}
        x = jnp.asarray(rng.randn(1, h, w, cin), dt)
        off = jnp.asarray(
            rng.randn(1, h, w, 18) * args.offset_scale, dt)
        mask = jnp.asarray(rng.rand(1, h, w, 9), dt)
        wt = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, dt)
        bias = jnp.asarray(rng.randn(cout), jnp.float32)

        cands = {
            "exact_auto": jax.jit(deform_conv2d),
            "exact_slot": jax.jit(_deform_conv2d_slot),
            "exact_fused": jax.jit(_deform_conv2d_slot_fused),
            "exact_onehot": jax.jit(_deform_conv2d_onehot),
            "local_r1": jax.jit(
                lambda *a: deform_conv2d_local(*a, max_offset=1)),
            "local_r1_premul": jax.jit(
                lambda *a: _with_impl(
                    "premul", deform_conv2d_local, *a, max_offset=1)),
            "local_r1_fused": jax.jit(
                lambda *a: _with_impl(
                    "fused", deform_conv2d_local, *a, max_offset=1)),
            "local_r1_shiftfirst": jax.jit(
                lambda *a: _with_impl(
                    "shiftfirst", deform_conv2d_local, *a,
                    max_offset=1)),
            "local_r2": jax.jit(
                lambda *a: deform_conv2d_local(*a, max_offset=2)),
            "local_r2_shiftfirst": jax.jit(
                lambda *a: _with_impl(
                    "shiftfirst", deform_conv2d_local, *a,
                    max_offset=2)),
            "local_r3": jax.jit(
                lambda *a: deform_conv2d_local(*a, max_offset=3)),
        }
        for name, fn in cands.items():
            # onehot materializes a dense (9*L, Lp) matrix: ~20 GB at
            # 136x240 — skip it above the stride-8 level (OOM risk).
            if name == "exact_onehot" and h * w > 8160:
                res[key][name] = "SKIP dense-M too large"
                continue
            try:
                res[key][name] = round(timeit(fn, x, off, mask, wt,
                                              bias), 3)
            except Exception as e:  # noqa: BLE001
                res[key][name] = f"FAIL {type(e).__name__}"
            print(key, name, res[key][name], flush=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
