import numpy as np
import jax
import jax.numpy as jnp

from centertrack_tpu.ops import dcn


def test_zero_offset_equals_plain_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(6).astype(np.float32))
    ours = dcn.plain_conv_reference(x, w, bias)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-4)


def test_integer_offset_shifts():
    # offset of exactly (0, +1) for every tap shifts sampling right by 1
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32) * 0.1)
    offset = np.zeros((1, 8, 8, 18), np.float32)
    offset[..., 1::2] = 1.0  # dx = +1 per tap
    mask = np.ones((1, 8, 8, 9), np.float32)
    out = dcn.deform_conv2d(x, jnp.asarray(offset), jnp.asarray(mask), w)
    x_shift = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]
    ref = dcn.plain_conv_reference(x_shift, w)
    # boundary columns differ (shifted-input conv pads where the deform
    # op still sees real pixels); interior must match exactly
    np.testing.assert_allclose(np.asarray(out)[:, :, 1:-1],
                               np.asarray(ref)[:, :, 1:-1], atol=1e-4)


def test_fractional_offset_bilinear():
    # half-pixel offset averages neighbors
    x = np.zeros((1, 5, 5, 1), np.float32)
    x[0, 2, 2, 0] = 1.0
    w = np.zeros((3, 3, 1, 1), np.float32)
    w[1, 1, 0, 0] = 1.0  # identity center tap
    offset = np.zeros((1, 5, 5, 18), np.float32)
    offset[..., 2 * 4 + 1] = 0.5  # center tap dx=+0.5
    mask = np.ones((1, 5, 5, 9), np.float32)
    out = np.asarray(dcn.deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(w)))
    assert abs(out[0, 2, 1, 0] - 0.5) < 1e-5
    assert abs(out[0, 2, 2, 0] - 0.5) < 1e-5


def test_mask_modulation():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
    offset = jnp.zeros((1, 6, 6, 18))
    half = jnp.full((1, 6, 6, 9), 0.5)
    full = jnp.ones((1, 6, 6, 9))
    o_half = dcn.deform_conv2d(x, offset, half, w)
    o_full = dcn.deform_conv2d(x, offset, full, w)
    np.testing.assert_allclose(np.asarray(o_half) * 2,
                               np.asarray(o_full), atol=1e-4)


def test_local_matches_gather_within_clamp():
    """The gather-free fast path must agree exactly with the reference
    gather implementation when offsets are inside the clamp range."""
    rng = np.random.RandomState(3)
    r = 2
    x = jnp.asarray(rng.randn(2, 10, 12, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(6).astype(np.float32))
    offset = jnp.asarray(
        rng.uniform(-r, r, (2, 10, 12, 18)).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 10, 12, 9).astype(np.float32))
    ref = dcn.deform_conv2d(x, offset, mask, w, bias)
    fast = dcn.deform_conv2d_local(x, offset, mask, w, bias, max_offset=r)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_local_taploop_matches_fused():
    """The taploop (training default — lighter backward transients) and
    fused (inference default — one K=9*Cin MXU matmul) schedules of the
    clamped DCN are the same contraction and must agree, values and
    offset gradients."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 9, 11, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(6).astype(np.float32))
    offset = jnp.asarray(
        rng.uniform(-3, 3, (2, 9, 11, 18)).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 9, 11, 9).astype(np.float32))
    fused = dcn.deform_conv2d_local(x, offset, mask, w, bias,
                                    max_offset=2, train=False)
    taploop = dcn.deform_conv2d_local(x, offset, mask, w, bias,
                                      max_offset=2, train=True)
    np.testing.assert_allclose(np.asarray(taploop), np.asarray(fused),
                               atol=1e-4, rtol=1e-5)

    def loss(off, train):
        return (dcn.deform_conv2d_local(x, off, mask, w, bias,
                                        max_offset=2,
                                        train=train) ** 2).sum()

    g_f = jax.grad(lambda o: loss(o, False))(offset)
    g_t = jax.grad(lambda o: loss(o, True))(offset)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_f),
                               atol=1e-2, rtol=1e-4)


def test_local_premul_matches_fused():
    """The premul schedule (contract-first; inference default when
    Cout < Cin — the 81 hat-term shifted reads shrink by Cin/Cout) is
    the same contraction as fused: sampling is linear, so the tap
    matmul commutes with bilinear sampling."""
    import os
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(2, 9, 11, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(4).astype(np.float32))
    offset = jnp.asarray(
        rng.uniform(-3, 3, (2, 9, 11, 18)).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 9, 11, 9).astype(np.float32))

    def with_impl(impl):
        prev = os.environ.get("CT_LOCAL_IMPL")
        os.environ["CT_LOCAL_IMPL"] = impl
        try:
            return dcn.deform_conv2d_local(x, offset, mask, w, bias,
                                           max_offset=2)
        finally:
            if prev is None:
                os.environ.pop("CT_LOCAL_IMPL", None)
            else:
                os.environ["CT_LOCAL_IMPL"] = prev

    fused = with_impl("fused")
    premul = with_impl("premul")
    np.testing.assert_allclose(np.asarray(premul), np.asarray(fused),
                               atol=1e-4, rtol=1e-4)
    # cout(4) < cin(8) at B=1: the inference default must pick premul
    # (bit-equal to the explicit premul run on the same slice)
    premul1 = with_impl("premul")  # env override, full batch
    default1 = dcn.deform_conv2d_local(x[:1], offset[:1], mask[:1], w,
                                       bias, max_offset=2, train=False)
    np.testing.assert_array_equal(np.asarray(default1),
                                  np.asarray(premul1)[:1])
    # B>1 inference defaults to taploop (docs/dcn_ms_ab.json): close to
    # but not bit-equal with premul
    default_b = dcn.deform_conv2d_local(x, offset, mask, w, bias,
                                        max_offset=2, train=False)
    np.testing.assert_allclose(np.asarray(default_b),
                               np.asarray(premul), atol=1e-4, rtol=1e-4)

    # bf16 (the serving dtype on the largest feature maps): both
    # schedules accumulate their contraction in fp32, so they must
    # agree to bf16 rounding of the transients, not drift apart
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    bb = bias.astype(jnp.bfloat16)
    ob = offset.astype(jnp.bfloat16)
    mb = mask.astype(jnp.bfloat16)

    def with_impl_b(impl):
        prev = os.environ.get("CT_LOCAL_IMPL")
        os.environ["CT_LOCAL_IMPL"] = impl
        try:
            return dcn.deform_conv2d_local(xb, ob, mb, wb, bb,
                                           max_offset=2)
        finally:
            if prev is None:
                os.environ.pop("CT_LOCAL_IMPL", None)
            else:
                os.environ["CT_LOCAL_IMPL"] = prev

    fused_b = np.asarray(with_impl_b("fused"), np.float32)
    premul_b = np.asarray(with_impl_b("premul"), np.float32)
    np.testing.assert_allclose(premul_b, fused_b, atol=0.05, rtol=0.03)
    # and both stay close to the fp32 reference
    np.testing.assert_allclose(premul_b, np.asarray(fused),
                               atol=0.15, rtol=0.05)


def test_local_shiftfirst_matches_fused():
    """The shiftfirst schedule (loop-swapped sampling: accumulate the
    tap stack over absolute shifts so each shifted read is shared by
    every tap whose clamped support contains it) is the same
    contraction as fused — identical tap stack, identical K=9*Cin
    matmul — so they must agree to accumulation-order rounding."""
    import os
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(2, 9, 11, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(4).astype(np.float32))
    offset = jnp.asarray(
        rng.uniform(-3, 3, (2, 9, 11, 18)).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 9, 11, 9).astype(np.float32))

    def with_impl(impl, r):
        prev = os.environ.get("CT_LOCAL_IMPL")
        os.environ["CT_LOCAL_IMPL"] = impl
        try:
            return dcn.deform_conv2d_local(x, offset, mask, w, bias,
                                           max_offset=r)
        finally:
            if prev is None:
                os.environ.pop("CT_LOCAL_IMPL", None)
            else:
                os.environ["CT_LOCAL_IMPL"] = prev

    for r in (1, 2):
        fused = with_impl("fused", r)
        sf = with_impl("shiftfirst", r)
        np.testing.assert_allclose(np.asarray(sf), np.asarray(fused),
                                   atol=1e-4, rtol=1e-4)


def test_local_impl_config_resolution():
    """Config.local_impl is the flag-visible schedule selector
    (promoted from the CT_LOCAL_IMPL shadow env var); the env var
    stays as the top-priority experiment override."""
    import os
    prev = os.environ.pop("CT_LOCAL_IMPL", None)
    try:
        # auto: mode-switch heuristic
        dcn.set_local_impl("auto")
        assert dcn.resolve_local_impl(True, 64, 64) == "taploop"
        assert dcn.resolve_local_impl(False, 64, 64) == "premul"
        assert dcn.resolve_local_impl(False, 128, 64) == "premul"
        assert dcn.resolve_local_impl(False, 128, 128) == "fused"
        # batched inference falls back to taploop: the premul/fused
        # B-scaled padded transients collapse at S=6 (docs/dcn_ms_ab.json
        # — the r4 multi-stream 96.6->29.9 regression)
        assert dcn.resolve_local_impl(False, 64, 64, batch=6) == "taploop"
        assert dcn.resolve_local_impl(False, 128, 128, batch=2) == "taploop"
        # explicit config choice applies to both train and inference
        dcn.set_local_impl("taploop")
        assert dcn.resolve_local_impl(False, 128, 128) == "taploop"
        assert dcn.resolve_local_impl(True, 64, 64) == "taploop"
        # env var overrides the config default
        os.environ["CT_LOCAL_IMPL"] = "fused"
        assert dcn.resolve_local_impl(True, 64, 64) == "fused"
        os.environ.pop("CT_LOCAL_IMPL")
        # engines install the config value at construction
        from centertrack_tpu.config import Config
        import dataclasses
        assert any(f.name == "local_impl"
                   for f in dataclasses.fields(Config))
        # CLI auto-bridge exposes it as --local_impl
        from centertrack_tpu.cli.opts import build_parser
        args = build_parser().parse_args(
            ["tracking", "--local_impl", "premul"])
        assert args.local_impl == "premul"
        # invalid values fail loudly
        import pytest as _pytest
        with _pytest.raises(ValueError):
            dcn.set_local_impl("bogus")
    finally:
        dcn.set_local_impl("auto")
        if prev is not None:
            os.environ["CT_LOCAL_IMPL"] = prev


def test_local_clamps_large_offsets():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
    big = jnp.full((1, 8, 8, 18), 10.0)
    clamped = jnp.full((1, 8, 8, 18), 2.0)
    mask = jnp.ones((1, 8, 8, 9))
    o_big = dcn.deform_conv2d_local(x, big, mask, w, max_offset=2)
    o_ref = dcn.deform_conv2d(x, clamped, mask, w)
    np.testing.assert_allclose(np.asarray(o_big), np.asarray(o_ref),
                               atol=1e-4)


def test_local_offset_gradients_flow():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
    mask = jnp.ones((1, 6, 6, 9))

    def loss(off):
        return (dcn.deform_conv2d_local(x, off, mask, w) ** 2).sum()

    off0 = jnp.full((1, 6, 6, 18), 0.3)
    g = jax.grad(loss)(off0)
    assert float(jnp.abs(g).max()) > 0


def test_slot_fast_path_matches_general():
    # the slot-packed gather path (dispatched for large maps) must be
    # bit-comparable to the per-corner reference path, including
    # out-of-image samples and partially-outside corners
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 12, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32))
    offset = jnp.asarray((rng.randn(2, 12, 16, 18) * 5).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 12, 16, 9).astype(np.float32))
    bias = jnp.asarray(rng.randn(4).astype(np.float32))
    slow = dcn.deform_conv2d(x, offset, mask, w, bias, impl="corner")
    fast = dcn._deform_conv2d_slot(x, offset, mask, w, bias)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               atol=1e-4, rtol=1e-4)


def test_slot_fast_path_gradients():
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
    mask = jnp.ones((1, 8, 8, 9))
    off0 = jnp.full((1, 8, 8, 18), 0.3)

    def loss_slot(off):
        return (dcn._deform_conv2d_slot(x, off, mask, w, None) ** 2).sum()

    def loss_gen(off):
        return (dcn.deform_conv2d(x, off, mask, w,
                                  impl="corner") ** 2).sum()

    g_slot = jax.grad(loss_slot)(off0)
    g_gen = jax.grad(loss_gen)(off0)
    np.testing.assert_allclose(np.asarray(g_slot), np.asarray(g_gen),
                               atol=1e-3, rtol=1e-3)


def test_slot_fused_matches_slot():
    """Tap-fused slot variant (one gather + one K=9*Cin matmul) is
    numerically identical to the per-tap slot path."""
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 14, 12, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32))
    offset = jnp.asarray((rng.randn(2, 14, 12, 18) * 4).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 14, 12, 9).astype(np.float32))
    bias = jnp.asarray(rng.randn(4).astype(np.float32))
    a = dcn._deform_conv2d_slot(x, offset, mask, w, bias)
    b = dcn._deform_conv2d_slot_fused(x, offset, mask, w, bias)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_mix_node_param_tree_and_dispatch():
    """dcn_mix shares the exact/local param tree bit-for-bit and
    dispatches exact gather on coarse maps, clamped-local on stride-4
    maps (design data: docs/dcn_drift_trained.json offset histograms +
    tools/dcn_levelbench.py timings)."""
    from centertrack_tpu.models.dla import DeformNode, IDAUp
    rng = jax.random.PRNGKey(0)
    nprng = np.random.RandomState(9)
    layers = [jnp.asarray(nprng.randn(1, 8, 8, 8), jnp.float32),
              jnp.asarray(nprng.randn(1, 4, 4, 16), jnp.float32)]
    v_dcn = IDAUp(8, (1, 2), node="dcn", base_stride=4).init(rng, layers)
    v_mix = IDAUp(8, (1, 2), node="dcn_mix", base_stride=4).init(
        rng, layers)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(a, b)), v_dcn, v_mix))

    x = jnp.asarray(nprng.randn(1, 10, 10, 8), jnp.float32)
    v = DeformNode(8, mode="gather").init(rng, x)
    # push params off the zero-offset init so exact != local
    v = jax.tree_util.tree_map(
        lambda a: a + 0.5 * nprng.randn(*a.shape).astype(np.float32), v)
    o_exact = DeformNode(8, mode="gather").apply(v, x)
    o_local = DeformNode(8, mode="local", max_offset=2).apply(v, x)
    o_coarse = DeformNode(8, mode="mix", map_stride=32).apply(v, x)
    o_fine = DeformNode(8, mode="mix", map_stride=4).apply(v, x)
    np.testing.assert_array_equal(np.asarray(o_coarse),
                                  np.asarray(o_exact))
    np.testing.assert_array_equal(np.asarray(o_fine),
                                  np.asarray(o_local))
    assert float(jnp.max(jnp.abs(o_exact - o_local))) > 1e-3


def test_onehot_matches_general():
    """One-hot matmul exact path == per-corner reference path, with
    samples landing outside the image and partially-outside corners
    (the clamp-into-pad-ring construction must reproduce the CUDA
    skip-invalid-corner semantics exactly)."""
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(2, 9, 13, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 5).astype(np.float32))
    offset = jnp.asarray((rng.randn(2, 9, 13, 18) * 6).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 9, 13, 9).astype(np.float32))
    bias = jnp.asarray(rng.randn(5).astype(np.float32))
    ref = dcn.deform_conv2d(x, offset, mask, w, bias, impl="corner")
    fast = dcn._deform_conv2d_onehot(x, offset, mask, w, bias)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_onehot_gradients():
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
    mask = jnp.ones((1, 8, 8, 9))
    off0 = jnp.full((1, 8, 8, 18), 0.3)

    def loss_oh(off):
        return (dcn._deform_conv2d_onehot(x, off, mask, w, None) ** 2).sum()

    def loss_gen(off):
        return (dcn.deform_conv2d(x, off, mask, w,
                                  impl="corner") ** 2).sum()

    g_oh = jax.grad(loss_oh)(off0)
    g_gen = jax.grad(loss_gen)(off0)
    np.testing.assert_allclose(np.asarray(g_oh), np.asarray(g_gen),
                               atol=1e-3, rtol=1e-3)
