"""Round-4 Mosaic probe: the tap-as-grid-dimension DCN kernel.

Tries ops/dcn_pallas_grid.deform_conv2d_pallas_grid on the real TPU at
escalating shapes (VERDICT r3 item 8 — a different program shape from
the per-tap *splits* that crash: one tap per grid step, block-revisited
f32 accumulator, dynamic pl.ds window slices). If it compiles, times it
against the production XLA path (ops/dcn.deform_conv2d_local) so the
fps impact can be judged.

Usage: python -m centertrack_tpu.tools.pallas_probe_grid [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax"))

import jax
import jax.numpy as jnp
import numpy as np

from centertrack_tpu.ops.dcn import deform_conv2d_local
from centertrack_tpu.ops.dcn_pallas_grid import deform_conv2d_pallas_grid

# (name, (b, h, w, cin, cout), r): tiny sanity -> the two production
# dla_34 neck shapes at 544x960 (stride-4 64ch and stride-8 128ch)
CASES = [
    ("tiny_16x24_8to16_r1", (1, 16, 24, 8, 16), 1),
    ("stride8_68x120_128", (1, 68, 120, 128, 128), 1),
    ("stride4_136x240_64", (1, 136, 240, 64, 64), 1),
]


def _time_fn(fn, args, iters=20):
    r = fn(*args)
    np.asarray(r)  # sync (axon: block_until_ready doesn't)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r)
    return (time.time() - t0) / iters * 1e3


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/pallas_probe_grid.json"
    results = {"ts": time.time()}
    for name, (b, h, w, cin, cout), r in CASES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
        wt = jnp.asarray(
            rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
        bias = jnp.asarray(rng.randn(cout).astype(np.float32))
        off = jnp.asarray(
            rng.uniform(-2, 2, (b, h, w, 18)).astype(np.float32))
        mask = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))
        t0 = time.time()
        try:
            fn = jax.jit(lambda *a: deform_conv2d_pallas_grid(
                *a, max_offset=r, row_tile=8))
            out = fn(x, off, mask, wt, bias)
            got = np.asarray(out)
            ref = np.asarray(deform_conv2d_local(
                x, off, mask, wt, bias, max_offset=r))
            ok = np.allclose(got, ref, atol=1e-2, rtol=1e-3)
            ms = _time_fn(fn, (x, off, mask, wt, bias))
            ref_fn = jax.jit(lambda *a: deform_conv2d_local(
                *a, max_offset=r))
            ms_ref = _time_fn(ref_fn, (x, off, mask, wt, bias))
            results[name] = (f"OK compile {time.time() - t0:.1f}s, "
                             f"parity={ok}, {ms:.2f} ms vs local "
                             f"{ms_ref:.2f} ms")
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL {type(e).__name__}: {e}"[:300]
        print(f"{name}: {results[name]}", file=sys.stderr, flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
