"""generic_post_process: the vectorized implementation must agree with
a naive per-detection evaluation of the reference semantics
(reference: src/lib/utils/post_process.py:21-91) on every head."""

import numpy as np

from centertrack_tpu.engine.post_process import (generic_post_process,
                                                 get_alpha)
from centertrack_tpu.ops.affine import (get_affine_transform,
                                        transform_preds_with_trans)
from centertrack_tpu.utils.ddd import ddd2locrot


class Cfg:
    out_thresh = 0.3


def _make_dets(rng, b=2, k=8, with_ddd=True, with_hps=True):
    scores = np.sort(rng.rand(b, k).astype(np.float32), axis=1)[:, ::-1]
    dets = {
        "scores": scores,
        "clses": rng.randint(0, 3, (b, k)),
        "cts": rng.rand(b, k, 2).astype(np.float32) * 96,
        "tracking": rng.randn(b, k, 2).astype(np.float32) * 3,
        "bboxes": rng.rand(b, k, 4).astype(np.float32) * 96,
    }
    if with_hps:
        dets["hps"] = rng.rand(b, k, 8).astype(np.float32) * 96
    if with_ddd:
        dets["dep"] = rng.rand(b, k, 1).astype(np.float32) * 30 + 1
        dets["dim"] = rng.rand(b, k, 3).astype(np.float32) * 2 + 0.5
        dets["rot"] = rng.randn(b, k, 8).astype(np.float32)
        dets["amodel_offset"] = rng.randn(b, k, 2).astype(np.float32)
        dets["nuscenes_att"] = rng.rand(b, k, 8).astype(np.float32)
        dets["velocity"] = rng.randn(b, k, 3).astype(np.float32)
    return dets


def _naive(cfg, dets, c, s, h, w, calibs):
    """Direct transliteration of the reference loop, as the oracle."""
    ret = []
    for i in range(len(dets["scores"])):
        preds = []
        trans = get_affine_transform(c[i], s[i], 0, (w, h),
                                     inv=1).astype(np.float32)
        for j in range(len(dets["scores"][i])):
            if dets["scores"][i][j] < cfg.out_thresh:
                break
            item = {"score": dets["scores"][i][j],
                    "class": int(dets["clses"][i][j]) + 1}
            ct = transform_preds_with_trans(
                dets["cts"][i][j].reshape(1, 2), trans).reshape(2)
            item["ct"] = ct
            tr = transform_preds_with_trans(
                (dets["tracking"][i][j] + dets["cts"][i][j]
                 ).reshape(1, 2), trans).reshape(2)
            item["tracking"] = tr - ct
            item["bbox"] = transform_preds_with_trans(
                dets["bboxes"][i][j].reshape(2, 2), trans).reshape(4)
            if "hps" in dets:
                item["hps"] = transform_preds_with_trans(
                    dets["hps"][i][j].reshape(-1, 2), trans).reshape(-1)
            if "dep" in dets:
                item["dep"] = dets["dep"][i][j]
                item["dim"] = dets["dim"][i][j]
                item["alpha"] = get_alpha(dets["rot"][i][j:j + 1])[0]
                ct_out = dets["bboxes"][i][j].reshape(2, 2).mean(axis=0)
                amodel = ct_out + dets["amodel_offset"][i][j]
                ct3d = transform_preds_with_trans(
                    amodel.reshape(1, 2), trans).reshape(2)
                item["ct"] = ct3d
                item["loc"], item["rot_y"] = ddd2locrot(
                    ct3d, item["alpha"], item["dim"], item["dep"][0],
                    calibs[i])
                item["nuscenes_att"] = dets["nuscenes_att"][i][j]
                item["velocity"] = dets["velocity"][i][j]
            preds.append(item)
        ret.append(preds)
    return ret


def _assert_same(got, want):
    assert len(got) == len(want)
    for gi, wi in zip(got, want):
        assert len(gi) == len(wi), (len(gi), len(wi))
        for g, w in zip(gi, wi):
            assert g["class"] == w["class"]
            for key in w:
                if key == "class":
                    continue
                np.testing.assert_allclose(
                    np.asarray(g[key], np.float32).reshape(-1),
                    np.asarray(w[key], np.float32).reshape(-1),
                    rtol=1e-4, atol=1e-4, err_msg=key)


def test_matches_naive_full_heads():
    rng = np.random.RandomState(0)
    dets = _make_dets(rng)
    c = [np.array([320.0, 240.0], np.float32)] * 2
    s = [640.0, 512.0]
    calibs = [np.array([[720, 0, 320, 40], [0, 720, 240, 2],
                        [0, 0, 1, 0]], np.float32)] * 2
    got = generic_post_process(Cfg(), dets, c, s, 96, 96, calibs)
    want = _naive(Cfg(), dets, c, s, 96, 96, calibs)
    _assert_same(got, want)


def test_matches_naive_tracking_only():
    rng = np.random.RandomState(1)
    dets = _make_dets(rng, with_ddd=False, with_hps=False)
    c = [np.array([480.0, 270.0], np.float32)] * 2
    s = [960.0, 960.0]
    got = generic_post_process(Cfg(), dets, c, s, 136, 240, None)
    want = _naive(Cfg(), dets, c, s, 136, 240, [None] * 2)
    _assert_same(got, want)


def test_threshold_prefix():
    rng = np.random.RandomState(2)
    dets = _make_dets(rng, with_ddd=False, with_hps=False)
    dets["scores"] = np.tile(
        np.linspace(0.9, 0.0, 8, dtype=np.float32), (2, 1))
    c = [np.array([50.0, 50.0], np.float32)] * 2
    s = [100.0, 100.0]
    out = generic_post_process(Cfg(), dets, c, s, 25, 25, None)
    for preds in out:
        assert len(preds) == int(
            (dets["scores"][0] >= Cfg.out_thresh).sum())
        assert all(p["score"] >= Cfg.out_thresh for p in preds)


def test_zero_survivors():
    rng = np.random.RandomState(3)
    dets = _make_dets(rng)
    dets["scores"] = np.zeros_like(dets["scores"])
    c = [np.array([50.0, 50.0], np.float32)] * 2
    s = [100.0, 100.0]
    calibs = [np.eye(3, 4, dtype=np.float32)] * 2
    out = generic_post_process(Cfg(), dets, c, s, 25, 25, calibs)
    assert out == [[], []]
