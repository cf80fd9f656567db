import numpy as np
import jax.numpy as jnp
import pytest

from centertrack_tpu.ops import dcn
from centertrack_tpu.ops.dcn_pallas import deform_conv2d_pallas
from centertrack_tpu.ops.dcn_pallas_grid import deform_conv2d_pallas_grid


def test_pallas_matches_local_interpret():
    rng = np.random.RandomState(0)
    r = 2
    b, h, w, cin, cout = 1, 16, 24, 8, 16
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))
    offset = jnp.asarray(
        rng.uniform(-3, 3, (b, h, w, 18)).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))

    ref = dcn.deform_conv2d_local(x, offset, mask, wt, bias, max_offset=r)
    out = deform_conv2d_pallas(x, offset, mask, wt, bias, max_offset=r,
                               row_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("r", [1, 2])
def test_pallas_grid_matches_local_interpret(r):
    """Tap-as-grid-dimension kernel shape (round-4 Mosaic retry)."""
    rng = np.random.RandomState(2)
    b, h, w, cin, cout = 2, 16, 24, 8, 16
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))
    offset = jnp.asarray(
        rng.uniform(-3, 3, (b, h, w, 18)).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))

    ref = dcn.deform_conv2d_local(x, offset, mask, wt, bias, max_offset=r)
    out = deform_conv2d_pallas_grid(x, offset, mask, wt, bias,
                                    max_offset=r, row_tile=8,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_pallas_grid_nondivisible_rows():
    rng = np.random.RandomState(3)
    b, h, w, cin, cout = 1, 13, 16, 4, 8
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    offset = jnp.asarray(
        rng.uniform(-1, 1, (b, h, w, 18)).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))
    ref = dcn.deform_conv2d_local(x, offset, mask, wt, None, max_offset=1)
    out = deform_conv2d_pallas_grid(x, offset, mask, wt, None,
                                    max_offset=1, row_tile=8,
                                    interpret=True)
    assert out.shape == (b, h, w, cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_pallas_nondivisible_rows():
    rng = np.random.RandomState(1)
    b, h, w, cin, cout = 2, 13, 16, 4, 8
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    wt = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    offset = jnp.asarray(
        rng.uniform(-1, 1, (b, h, w, 18)).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))
    ref = dcn.deform_conv2d_local(x, offset, mask, wt, None, max_offset=2)
    out = deform_conv2d_pallas(x, offset, mask, wt, None, max_offset=2,
                               row_tile=8, interpret=True)
    assert out.shape == (b, h, w, cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)
