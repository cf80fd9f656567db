import numpy as np
import jax.numpy as jnp

from centertrack_tpu.ops import gaussian


def test_radius_law_values():
    # Spot values from the CornerNet IoU-0.7 radius law.
    r = gaussian.gaussian_radius((10, 20))
    assert 0 < r < 20
    assert gaussian.gaussian_radius((100, 100)) > gaussian.gaussian_radius(
        (10, 10))


def _loop_render(h, w, c, cts, radii, channels, ks, valid):
    hm = np.zeros((c, h, w), np.float32)
    for i in range(len(cts)):
        if not valid[i]:
            continue
        gaussian.draw_umich_gaussian(
            hm[channels[i]], cts[i], int(radii[i]), k=float(ks[i]))
    return hm.transpose(1, 2, 0)


def test_render_matches_loop():
    rng = np.random.RandomState(0)
    h, w, c, n = 48, 64, 3, 20
    cts = np.stack([rng.randint(0, w, n), rng.randint(0, h, n)], 1)
    radii = rng.randint(0, 8, n)
    channels = rng.randint(0, c, n)
    ks = np.ones(n, np.float32)
    valid = rng.rand(n) > 0.2

    ref = _loop_render(h, w, c, cts, radii, channels, ks, valid)
    ours = np.asarray(gaussian.render_gaussians(
        h, w, c, jnp.asarray(cts, jnp.int32), jnp.asarray(radii, jnp.int32),
        jnp.asarray(channels, jnp.int32), jnp.asarray(ks),
        jnp.asarray(valid)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_render_conf_k():
    # disturbed pre_hm uses k=0 splats (dropped tracks): must contribute 0
    h, w = 32, 32
    cts = np.array([[16, 16], [8, 8]], np.int32)
    radii = np.array([4, 4], np.int32)
    ks = np.array([1.0, 0.0], np.float32)
    valid = np.array([True, True])
    out = np.asarray(gaussian.render_pre_hm(
        h, w, jnp.asarray(cts), jnp.asarray(radii), jnp.asarray(ks),
        jnp.asarray(valid)))[..., 0]
    assert out[16, 16] == 1.0
    assert out[8, 8] == 0.0


def test_render_clips_at_border():
    h, w = 20, 20
    cts = np.array([[0, 0]], np.int32)
    radii = np.array([5], np.int32)
    ref = np.zeros((h, w), np.float32)
    gaussian.draw_umich_gaussian(ref, (0, 0), 5)
    ours = np.asarray(gaussian.render_pre_hm(
        h, w, jnp.asarray(cts), jnp.asarray(radii),
        jnp.ones(1), jnp.ones(1, bool)))[..., 0]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_windowed_render_matches_dense():
    # force the windowed path (H*W > 128^2) and compare with a host loop
    rng = np.random.RandomState(3)
    h, w, n = 160, 160, 12
    cts = np.stack([rng.randint(0, w, n), rng.randint(0, h, n)], 1)
    radii = rng.randint(0, 20, n)
    ks = rng.choice([0.0, 1.0], n).astype(np.float32)
    valid = rng.rand(n) > 0.2
    ref = np.zeros((h, w), np.float32)
    for i in range(n):
        if valid[i]:
            gaussian.draw_umich_gaussian(ref, cts[i], int(radii[i]),
                                         k=float(ks[i]))
    out = np.asarray(gaussian.render_pre_hm(
        h, w, jnp.asarray(cts, jnp.int32), jnp.asarray(radii, jnp.int32),
        jnp.asarray(ks), jnp.asarray(valid)))[..., 0]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_compact_render_matches_scan():
    """The serving-engine compact path (live slots sorted to the front,
    lax.while_loop trip count = live count) is value-exact vs the dense
    scan: max-splatting commutes, so the reorder cannot change the
    canvas. Mirrors the device-tracker regime: large capacity, few
    live slots."""
    rng = np.random.RandomState(7)
    h, w, n = 200, 288, 64
    cts = np.stack([rng.randint(-8, w + 8, n),
                    rng.randint(-8, h + 8, n)], 1)
    radii = rng.randint(0, 30, n)
    ks = rng.rand(n).astype(np.float32)
    valid = rng.rand(n) > 0.8          # ~13 live of 64 slots
    args = (h, w, jnp.asarray(cts, jnp.int32),
            jnp.asarray(radii, jnp.int32), jnp.asarray(ks),
            jnp.asarray(valid))
    dense = np.asarray(gaussian.render_pre_hm(*args))
    compact = np.asarray(gaussian.render_pre_hm(*args, compact=True))
    np.testing.assert_array_equal(compact, dense)
    # all-dead: while_loop body never runs
    none = np.asarray(gaussian.render_pre_hm(
        h, w, jnp.asarray(cts, jnp.int32), jnp.asarray(radii, jnp.int32),
        jnp.asarray(ks), jnp.zeros(n, bool), compact=True))
    assert none.sum() == 0
