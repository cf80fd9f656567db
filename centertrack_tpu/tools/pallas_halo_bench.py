"""TPU bench: halo-DMA Pallas DCN kernel vs the XLA shift path.

Times deform_conv2d_local (pure XLA) against deform_conv2d_local_halo
(Pallas) at the four DLA neck map shapes of a 544x960 input, r=1 and
r=2, bf16. Writes one JSON dict to /tmp/pallas_halo_bench.json.

Timing note: block_until_ready does not sync through the axon tunnel —
a forced np.asarray() transfer is the fence (CLAUDE.md).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from centertrack_tpu.ops.dcn import deform_conv2d_local
from centertrack_tpu.ops.dcn_pallas_halo import deform_conv2d_local_halo

SHAPES = [(136, 240, 64), (68, 120, 128), (34, 60, 256), (17, 30, 512)]
DT = jnp.bfloat16


def timeit(fn, *args, iters=30):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    res = {"device": str(jax.devices()[0])}
    rng = np.random.RandomState(0)
    for h, w, c in SHAPES:
        key = f"{h}x{w}x{c}"
        res[key] = {}
        x = jnp.asarray(rng.randn(1, h, w, c), DT)
        off = jnp.asarray(rng.randn(1, h, w, 18), DT)
        mask = jnp.asarray(rng.rand(1, h, w, 9), DT)
        wt = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, DT)
        bias = jnp.asarray(rng.randn(c), jnp.float32)
        for r in (1, 2):
            f_x = jax.jit(lambda *a, r=r: deform_conv2d_local(
                *a, max_offset=r))
            try:
                res[key][f"xla_r{r}"] = round(
                    timeit(f_x, x, off, mask, wt, bias), 3)
            except Exception as e:  # noqa: BLE001
                res[key][f"xla_r{r}"] = f"FAIL {type(e).__name__}"
            for rt in (None, 8, 16, 32):
                f_p = jax.jit(lambda *a, r=r, rt=rt:
                              deform_conv2d_local_halo(
                                  *a, max_offset=r, row_tile=rt,
                                  col_tile=w))
                tag = f"halo_r{r}_rt{rt}"
                try:
                    res[key][tag] = round(
                        timeit(f_p, x, off, mask, wt, bias), 3)
                except Exception as e:  # noqa: BLE001
                    res[key][tag] = f"FAIL {type(e).__name__}: " + \
                        str(e).split("\n")[0][:120]
                print(key, tag, res[key][tag], flush=True)
        print(key, res[key], flush=True)
    with open("/tmp/pallas_halo_bench.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
