import cv2
import numpy as np
import pytest

from centertrack_tpu.ops import affine


@pytest.mark.parametrize("rot", [0, 15, -30])
@pytest.mark.parametrize("inv", [0, 1])
def test_matches_cv2_getaffine(rot, inv):
    rng = np.random.RandomState(0)
    for _ in range(10):
        c = rng.uniform(50, 500, size=2).astype(np.float32)
        s = float(rng.uniform(100, 800))
        out = (int(rng.randint(64, 512)), int(rng.randint(64, 512)))
        ours = affine.get_affine_transform(c, s, rot, out, inv=inv)

        # cv2-based construction identical to the reference implementation
        scale = np.array([s, s], dtype=np.float32)
        rot_rad = np.pi * rot / 180
        src_dir = affine.get_dir([0, scale[0] * -0.5], rot_rad)
        dst_dir = np.array([0, out[0] * -0.5], np.float32)
        src = np.zeros((3, 2), dtype=np.float32)
        dst = np.zeros((3, 2), dtype=np.float32)
        src[0, :] = c
        src[1, :] = c + src_dir
        dst[0, :] = [out[0] * 0.5, out[1] * 0.5]
        dst[1, :] = np.array([out[0] * 0.5, out[1] * 0.5]) + dst_dir
        src[2:, :] = affine.get_3rd_point(src[0, :], src[1, :])
        dst[2:, :] = affine.get_3rd_point(dst[0, :], dst[1, :])
        if inv:
            ref = cv2.getAffineTransform(np.float32(dst), np.float32(src))
        else:
            ref = cv2.getAffineTransform(np.float32(src), np.float32(dst))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_affine_transform_point():
    t = affine.get_affine_transform(
        np.array([100.0, 80.0]), 200.0, 0, (128, 128))
    pt = affine.affine_transform([100.0, 80.0], t)
    np.testing.assert_allclose(pt, [64.0, 64.0], atol=1e-4)


def test_invert_affine_roundtrip():
    t = affine.get_affine_transform(
        np.array([123.0, 45.0]), 300.0, 10, (96, 128))
    t_inv = affine.invert_affine(t)
    pts = np.random.RandomState(1).uniform(0, 100, size=(5, 2))
    fwd = affine.transform_preds_with_trans(pts.astype(np.float32), t)
    back = affine.transform_preds_with_trans(fwd, t_inv)
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_inv_matches_forward_inverse():
    c = np.array([200.0, 150.0])
    t = affine.get_affine_transform(c, 400.0, 0, (160, 96))
    t_inv = affine.get_affine_transform(c, 400.0, 0, (160, 96), inv=1)
    np.testing.assert_allclose(affine.invert_affine(t), t_inv, atol=1e-3)
