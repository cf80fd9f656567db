import cv2
import numpy as np
import jax.numpy as jnp

from centertrack_tpu.ops import affine, warp


def test_affine_warp_matches_cv2():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (120, 160, 3), np.uint8)
    c = np.array([80.0, 60.0], np.float32)
    s = 160.0
    out_w, out_h = 96, 64
    trans = affine.get_affine_transform(c, s, 0, (out_w, out_h))
    ref = cv2.warpAffine(img, trans.astype(np.float32), (out_w, out_h),
                         flags=cv2.INTER_LINEAR)
    inv = affine.invert_affine(trans)
    ours = np.asarray(warp.affine_warp(
        jnp.asarray(img), jnp.asarray(inv, jnp.float32), out_h, out_w))
    # cv2 uses 5-bit fixed point; allow ~2 LSB
    assert np.abs(ours - ref.astype(np.float32)).max() <= 2.0


def test_preprocess_normalization():
    img = np.full((32, 32, 3), 128, np.uint8)
    trans = affine.get_affine_transform(
        np.array([16.0, 16.0]), 32.0, 0, (32, 32))
    inv = affine.invert_affine(trans)
    mean = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    std = jnp.asarray([0.25, 0.25, 0.25], jnp.float32)
    out = np.asarray(warp.preprocess_frame(
        jnp.asarray(img), jnp.asarray(inv, jnp.float32), 32, 32, mean, std))
    expect = (128 / 255.0 - 0.5) / 0.25
    np.testing.assert_allclose(out, expect, atol=1e-5)
    assert out.shape == (1, 32, 32, 3)


def test_separable_warp_matches_gather():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (90, 130, 3), np.uint8)
    c = np.array([65.0, 45.0], np.float32)
    s = 130.0
    trans = affine.get_affine_transform(c, s, 0, (64, 48))
    inv = jnp.asarray(affine.invert_affine(trans), jnp.float32)
    ref = np.asarray(warp.affine_warp(jnp.asarray(img), inv, 48, 64))
    sep = np.asarray(warp.affine_warp_separable(
        jnp.asarray(img), inv, 48, 64))
    np.testing.assert_allclose(sep, ref, atol=1e-2)


def test_fast_warp_precision_close_to_exact():
    """The bf16-serving warp (precision=DEFAULT — one MXU pass instead
    of HIGHEST's 6-pass fp32 emulation) must stay within ~1 intensity
    LSB of the exact warp: each output mixes only 2 hat weights per
    axis, so the bf16 rounding error is ~pixel * 2^-8."""
    import jax
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (180, 260, 3), np.uint8)
    c = np.array([130.0, 90.0], np.float32)
    trans = affine.get_affine_transform(c, 260.0, 0, (128, 96))
    inv = jnp.asarray(affine.invert_affine(trans), jnp.float32)
    exact = np.asarray(warp.affine_warp_separable(
        jnp.asarray(img), inv, 96, 128))
    fast = np.asarray(warp.affine_warp_separable(
        jnp.asarray(img), inv, 96, 128,
        precision=jax.lax.Precision.DEFAULT))
    assert np.abs(fast - exact).max() <= 1.5


def test_warp_precision_for_config():
    import jax
    from centertrack_tpu.config import Config
    hi = jax.lax.Precision.HIGHEST
    lo = jax.lax.Precision.DEFAULT
    assert warp.warp_precision_for(
        Config(task="tracking", compute_dtype="bfloat16")) == lo
    assert warp.warp_precision_for(
        Config(task="tracking", compute_dtype="float32")) == hi
    assert warp.warp_precision_for(
        Config(task="tracking", compute_dtype="bfloat16",
               warp_precision="highest")) == hi
    assert warp.warp_precision_for(
        Config(task="tracking", warp_precision="default")) == lo
    import pytest
    with pytest.raises(ValueError, match="warp_precision"):
        warp.warp_precision_for(
            Config(task="tracking", warp_precision="bogus"))
