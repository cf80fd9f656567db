"""Per-stage device profile of the fused serving step (headline
protocol: dla_34 dcn_local1, bf16, 544x960, trained weights).

Answers "where do the milliseconds go" for the S=1 latency wall
(docs/PERF.md): times each stage of the fused program in isolation —
input warp (both matmul precisions), pre_hm render (dense scan vs
compacted while_loop), network forward, decode — plus the end-to-end
fused step, against the reference's per-stage timing discipline
(reference: src/lib/detector.py:56-172 tot/load/pre/net/dec/post/merge
averages).

Timing through the axon tunnel: block_until_ready does NOT sync, so
each measurement dispatches N chained calls and forces ONE tiny
np.asarray fetch at the end; the ~29 ms D2H round trip and the
~0.3 ms/call dispatch are reported as `null_fetch_ms`/`dispatch_ms`
baselines rather than subtracted.

Usage: python -m centertrack_tpu.tools.stage_probe [--out docs/stage_probe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf).ravel()[:1]


def timeit(fn, *args, iters=60, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    _sync(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    _sync(r)
    return round((time.time() - t0) / iters * 1000, 3)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/stage_probe.json")
    p.add_argument("--iters", type=int, default=60)
    p.add_argument("--breakdown", action="store_true",
                   help="also time conv-node/backbone/per-schedule "
                        "forwards (adds several cold compiles)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    import bench

    from centertrack_tpu.ops.decode import generic_decode, sigmoid_output
    from centertrack_tpu.ops.gaussian import render_pre_hm
    from centertrack_tpu.ops.warp import preprocess_frame

    det, cfg, trained = bench.build_detector(
        "dcn_local1", bench.CKPT_LOCAL1)
    meta = bench._mot_meta()
    frames = bench.synth_frames(4)
    fu8 = jnp.asarray(frames[0])
    res = {"protocol": ("dla_34 dcn_local1 bf16 544x960 trained ckpt; "
                        "N chained dispatches, one tiny sync fetch"),
           "trained": trained, "iters": args.iters,
           "date": time.strftime("%Y-%m-%d")}

    # null baselines
    tiny = jax.jit(lambda a: a + 1)
    z = jnp.zeros((8,), jnp.float32)
    res["dispatch_ms"] = timeit(tiny, z, iters=200)
    t0 = time.time()
    for _ in range(20):
        _sync(tiny(z))
    res["null_fetch_ms"] = round((time.time() - t0) / 20 * 1000, 3)

    # stage: input warp (1080p -> 544x960), both precisions
    mean = jnp.asarray(meta.mean)
    std = jnp.asarray(meta.std)
    inv_in, _, _ = det._transforms(1080, 1920)
    for name, prec in (("warp_highest_ms", jax.lax.Precision.HIGHEST),
                       ("warp_default_ms", jax.lax.Precision.DEFAULT)):
        f = jax.jit(lambda u8, it, _p=prec: preprocess_frame(
            u8, it, cfg.input_h, cfg.input_w, mean, std,
            axis_aligned=True, precision=_p))
        res[name] = timeit(f, fu8, inv_in, iters=args.iters)

    # stage: pre_hm render at the serving regime (~10 live / 256 slots)
    cap = cfg.max_tracks
    rng = np.random.RandomState(0)
    cts = jnp.asarray(np.stack([rng.randint(0, cfg.input_w, cap),
                                rng.randint(0, cfg.input_h, cap)], 1),
                      jnp.int32)
    radii = jnp.asarray(rng.randint(3, 24, cap), jnp.int32)
    ks = jnp.ones((cap,), jnp.float32)
    valid = jnp.asarray(np.arange(cap) < 10)
    for name, compact in (("prehm_scan_ms", False),
                          ("prehm_compact_ms", True)):
        f = jax.jit(lambda c, r, k, v, _c=compact: render_pre_hm(
            cfg.input_h, cfg.input_w, c, r, k, v, compact=_c))
        res[name] = timeit(f, cts, radii, ks, valid, iters=args.iters)

    # stage: network forward / forward+decode (preprocessed inputs)
    img = jnp.zeros((1, cfg.input_h, cfg.input_w, 3), jnp.float32)
    prehm = jnp.zeros((1, cfg.input_h, cfg.input_w, 1), jnp.float32)
    params = det.params
    bs = det.batch_stats

    @jax.jit
    def fwd(image, pre_img, pre_hm):
        return det.model.apply({"params": params, "batch_stats": bs},
                               image, pre_img, pre_hm, train=False)[-1]

    res["forward_ms"] = timeit(fwd, img, img, prehm, iters=args.iters)

    if args.breakdown:
        # ---- where inside the forward do the ms go ------------------
        # (a) same architecture with 1x1-conv nodes (random init —
        #     timing only): forward minus this = in-model cost of the
        #     11 clamped-DCN modules. (b) backbone (DLA base) alone.
        # (c) full forward under each local-DCN schedule.
        def fwd_for(node, impl=""):
            prev = os.environ.get("CT_LOCAL_IMPL")
            if impl:
                os.environ["CT_LOCAL_IMPL"] = impl
            try:
                det2, _, _ = bench.build_detector(node, "/nonexistent")
                f = jax.jit(lambda a, b, c: det2.model.apply(
                    {"params": det2.params,
                     "batch_stats": det2.batch_stats},
                    a, b, c, train=False)[-1])
                return timeit(f, img, img, prehm, iters=args.iters)
            finally:
                if impl:
                    if prev is None:
                        os.environ.pop("CT_LOCAL_IMPL", None)
                    else:
                        os.environ["CT_LOCAL_IMPL"] = prev

        res["forward_convnode_ms"] = fwd_for("conv")
        for impl in ("taploop", "premul", "fused", "shiftfirst"):
            res[f"forward_local1_{impl}_ms"] = fwd_for("dcn_local1",
                                                       impl)

        # backbone alone (the DLA base incl. temporal stems)
        from centertrack_tpu.models.dla import DLA, DLA_CONFIGS
        levels, channels, block = DLA_CONFIGS[34]
        base = DLA(levels, channels, block, with_pre_img=True,
                   with_pre_hm=True, dtype=jnp.bfloat16)
        var = jax.jit(base.init, static_argnames="train")(
            jax.random.PRNGKey(0), img, img, prehm, train=False)

        @jax.jit
        def bk(a, b, c):
            return base.apply(var, a, b, c, train=False)[-1]

        res["backbone_ms"] = timeit(bk, img, img, prehm,
                                    iters=args.iters)

    @jax.jit
    def fwd_dec(image, pre_img, pre_hm):
        out = det.model.apply({"params": params, "batch_stats": bs},
                              image, pre_img, pre_hm, train=False)[-1]
        out = sigmoid_output(out, cfg.depth_scale)
        return generic_decode(out, cfg.K, cfg.num_classes)

    res["forward_decode_ms"] = timeit(fwd_dec, img, img, prehm,
                                      iters=args.iters)

    # end to end: the fused one-frame step (device tracker included),
    # timed exactly like the headline (lag-4 pipeline, no per-frame
    # materialization beyond the packed row async copy)
    fps, live = bench.timed_tracking(det, cfg, frames, iters=args.iters)
    res["fused_step_ms"] = round(1000.0 / fps, 3)
    res["fused_fps"] = round(fps, 2)
    res["live_tracks"] = round(live, 1)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
