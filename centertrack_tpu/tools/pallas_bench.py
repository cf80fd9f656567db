"""Compile + time the tap-grid Pallas DCN kernel on the real TPU vs the
pure-XLA deform_conv2d_local, at the production shapes of the DLA neck
(MOT17 544x960). Usage: python -m centertrack_tpu.tools.pallas_bench
"""

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
from centertrack_tpu.ops.dcn_pallas_shift import deform_conv2d_local_pallas


def timeit(jf, args, iters=30):
    r = jf(*args)
    v = float(np.asarray(r))
    for _ in range(3):
        r = jf(*args)
    np.asarray(r)
    t0 = time.time()
    for _ in range(iters):
        r = jf(*args)
    np.asarray(r)
    return (time.time() - t0) / iters * 1e3, v


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/pallas_bench.json"
    report = {}
    for (h, w, cin, cout, ct) in ((136, 240, 64, 64, 120),
                                  (68, 120, 128, 128, 120),
                                  (34, 60, 256, 256, 60)):
        key = f"{h}x{w}x{cin}"
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, h, w, cin), jnp.bfloat16)
        off = jnp.asarray(rng.randn(1, h, w, 18) * 2.0, jnp.bfloat16)
        mask = jnp.asarray(rng.rand(1, h, w, 9), jnp.bfloat16)
        wt = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
        bias = jnp.asarray(rng.randn(cout) * 0.01, jnp.bfloat16)
        res = {}
        for r in (1, 2):
            jf_x = jax.jit(lambda *a, r=r: jnp.sum(jnp.abs(
                deform_conv2d_local(*a, max_offset=r)
                .astype(jnp.float32))))
            ms, v_ref = timeit(jf_x, (x, off, mask, wt, bias))
            res[f"xla_local{r}"] = round(ms, 3)
            try:
                jf_p = jax.jit(lambda *a, r=r: jnp.sum(jnp.abs(
                    deform_conv2d_local_pallas(*a, r, 8, ct)
                    .astype(jnp.float32))))
                ms, v = timeit(jf_p, (x, off, mask, wt, bias))
                res[f"pallas_local{r}"] = round(ms, 3)
                if not np.isclose(v, v_ref, rtol=2e-2):
                    res[f"pallas_local{r}_MISMATCH"] = [v, v_ref]
            except Exception as e:  # noqa: BLE001
                res[f"pallas_local{r}"] = \
                    f"FAIL {type(e).__name__}: {e}"[:200]
            print(f"{key} r={r}: {res}", file=sys.stderr, flush=True)
        report[key] = res
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
