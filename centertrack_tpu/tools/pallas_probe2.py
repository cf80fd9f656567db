"""Round-3 Mosaic lowering probes: which scratch-load shapes compile?

The halo-DMA DCN kernel crashed the remote compile helper on a 3-D
misaligned vector.load (vector<8x60x256>). These probes isolate which
load patterns the toolchain accepts, each as a minimal kernel:

  p10  3-D scratch, full-extent aligned load            (control)
  p11  3-D scratch, offset only in leading untiled dim
  p12  3-D scratch, offset in sublane (2nd-to-last) dim
  p13  full 3-D load, then value-level slice
  p14  4-D scratch, index leading dims, full last two
  p15  DMA HBM->VMEM window + p11-style load (halo design core)

Writes /tmp/pallas_probe2.json. Run on the real TPU.
"""

import functools
import json

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RT, CT, C = 8, 240, 64
P = 2  # halo


def _run(name, fn, *args, res=None):
    try:
        out = jax.jit(fn)(*args)
        val = float(np.asarray(out).sum())
        res[name] = f"OK sum={val:.3f}"
    except Exception as e:  # noqa: BLE001
        res[name] = f"FAIL {type(e).__name__}: {str(e).splitlines()[0][:100]}"
    print(name, res[name], flush=True)


def p10_aligned(res):
    def kern(x_ref, o_ref, scr, sem):
        cp = pltpu.make_async_copy(x_ref.at[0], scr, sem)
        cp.start()
        cp.wait()
        o_ref[0] = scr[:, :, :][:RT, :CT, :] * 2.0

    x = jnp.ones((1, RT + P, CT + P, C), jnp.bfloat16)
    f = lambda x: pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, RT, CT, C), lambda i: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, RT, CT, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((RT + P, CT + P, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA])(x)
    _run("p10_fullload_valueslice", f, x, res=res)


def p11_leading_offset(res):
    def kern(x_ref, o_ref, scr, sem):
        cp = pltpu.make_async_copy(x_ref.at[0], scr, sem)
        cp.start()
        cp.wait()
        acc = jnp.zeros((RT, CT + P, C), jnp.float32)
        for a in range(P + 1):
            acc += scr[pl.ds(a, RT), :, :].astype(jnp.float32)
        o_ref[0] = acc[:, :CT, :].astype(jnp.bfloat16)

    x = jnp.ones((1, RT + P, CT + P, C), jnp.bfloat16)
    f = lambda x: pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, RT, CT, C), lambda i: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, RT, CT, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((RT + P, CT + P, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA])(x)
    _run("p11_leading_dim_offset", f, x, res=res)


def p12_sublane_offset(res):
    def kern(x_ref, o_ref, scr, sem):
        cp = pltpu.make_async_copy(x_ref.at[0], scr, sem)
        cp.start()
        cp.wait()
        acc = jnp.zeros((RT, CT, C), jnp.float32)
        for b in range(P + 1):
            acc += scr[:RT, pl.ds(b, CT), :].astype(jnp.float32)
        o_ref[0] = acc.astype(jnp.bfloat16)

    x = jnp.ones((1, RT + P, CT + P, C), jnp.bfloat16)
    f = lambda x: pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, RT, CT, C), lambda i: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, RT, CT, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((RT + P, CT + P, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA])(x)
    _run("p12_sublane_offset", f, x, res=res)


def p13_value_slice(res):
    def kern(x_ref, o_ref, scr, sem):
        cp = pltpu.make_async_copy(x_ref.at[0], scr, sem)
        cp.start()
        cp.wait()
        v = scr[:, :, :]
        acc = jnp.zeros((RT, CT, C), jnp.float32)
        for a in range(P + 1):
            acc += jax.lax.dynamic_slice(
                v, (a, a, 0), (RT, CT, C)).astype(jnp.float32)
        o_ref[0] = acc.astype(jnp.bfloat16)

    x = jnp.ones((1, RT + P, CT + P, C), jnp.bfloat16)
    f = lambda x: pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, RT, CT, C), lambda i: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, RT, CT, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((RT + P, CT + P, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA])(x)
    _run("p13_value_dynslice", f, x, res=res)


def p14_4d_leading(res):
    D = 5

    def kern(x_ref, o_ref, scr, sem):
        cp = pltpu.make_async_copy(x_ref.at[0], scr, sem)
        cp.start()
        cp.wait()
        acc = jnp.zeros((RT, CT, C), jnp.float32)
        for s in range(D):
            for a in range(P + 1):
                acc += scr[s, pl.ds(a, RT), :, :].astype(jnp.float32)
        o_ref[0] = acc.astype(jnp.bfloat16)

    x = jnp.ones((1, D, RT + P, CT, C), jnp.bfloat16)
    f = lambda x: pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, RT, CT, C), lambda i: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, RT, CT, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((D, RT + P, CT, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA])(x)
    _run("p14_4d_leading_index", f, x, res=res)


def p15_dynamic_leading(res):
    # leading-dim offset that depends on the grid index (the real
    # kernel's row_base is dynamic) + static shift
    def kern(x_ref, o_ref, scr, sem):
        t = pl.program_id(0)
        cp = pltpu.make_async_copy(x_ref.at[0], scr, sem)
        cp.start()
        cp.wait()
        acc = jnp.zeros((RT, CT, C), jnp.float32)
        for a in range(P + 1):
            acc += scr[pl.ds(t + a, RT), :, :].astype(jnp.float32)
        o_ref[0] = acc[:, :CT, :].astype(jnp.bfloat16)

    x = jnp.ones((1, RT + 2 * P, CT, C), jnp.bfloat16)
    f = lambda x: pl.pallas_call(
        kern, grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, RT, CT, C), lambda i: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, RT, CT, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((RT + 2 * P, CT, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA])(x)
    _run("p15_dynamic_leading_offset", f, x, res=res)


def main():
    res = {"device": str(jax.devices()[0])}
    for fn in (p10_aligned, p11_leading_offset, p12_sublane_offset,
               p13_value_slice, p14_4d_leading, p15_dynamic_leading):
        fn(res)
    with open("/tmp/pallas_probe2.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
