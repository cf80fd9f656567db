"""Shape-tolerant checkpoint loading: reset_hm / reuse_hm semantics
(reference: src/lib/model/model.py:46-71). The canonical workflow is
finetuning a pretrain with a different class count."""

import numpy as np
import pytest

from centertrack_tpu.models.model import load_model, save_model


def _ckpt_trees(n_classes):
    rng = np.random.RandomState(n_classes)
    params = {
        "backbone": {"conv": {"kernel": rng.randn(3, 3, 4, 8)
                              .astype(np.float32)}},
        "heads": {
            "hm": {"out": {"kernel": rng.randn(1, 1, 8, n_classes)
                           .astype(np.float32),
                           "bias": rng.randn(n_classes)
                           .astype(np.float32)}},
            "wh": {"out": {"kernel": rng.randn(1, 1, 8, 2)
                           .astype(np.float32),
                           "bias": rng.randn(2).astype(np.float32)}},
        },
    }
    stats = {"backbone": {"bn": {"mean": rng.randn(8).astype(np.float32),
                                 "var": rng.rand(8).astype(np.float32)}}}
    return params, stats


@pytest.fixture()
def ckpt3(tmp_path):
    p, s = _ckpt_trees(3)
    path = str(tmp_path / "pretrain3.ckpt")
    save_model(path, 7, p, s)
    return path, p, s


def test_exact_match_roundtrip(ckpt3):
    path, p, s = ckpt3
    tmpl_p, tmpl_s = _ckpt_trees(3)
    out = load_model(path, tmpl_p, tmpl_s, verbose=False)
    np.testing.assert_array_equal(
        out["params"]["heads"]["hm"]["out"]["kernel"],
        p["heads"]["hm"]["out"]["kernel"])
    assert out["epoch"] == 7


def test_mismatch_skips_by_default(ckpt3):
    """3-class pretrain -> 1-class model: without reuse_hm the hm out
    layer keeps its fresh init; everything else loads."""
    path, p, _ = ckpt3
    tmpl_p, tmpl_s = _ckpt_trees(1)
    init_hm = tmpl_p["heads"]["hm"]["out"]["kernel"].copy()
    out = load_model(path, tmpl_p, tmpl_s, verbose=False)
    np.testing.assert_array_equal(
        out["params"]["heads"]["hm"]["out"]["kernel"], init_hm)
    np.testing.assert_array_equal(
        out["params"]["backbone"]["conv"]["kernel"],
        p["backbone"]["conv"]["kernel"])
    np.testing.assert_array_equal(
        out["params"]["heads"]["wh"]["out"]["kernel"],
        p["heads"]["wh"]["out"]["kernel"])


def test_reuse_hm_copies_overlap(ckpt3):
    """reuse_hm: the first min(classes) output channels come from the
    checkpoint, the rest keep their init."""
    path, p, _ = ckpt3
    tmpl_p, tmpl_s = _ckpt_trees(5)
    init_k = tmpl_p["heads"]["hm"]["out"]["kernel"].copy()
    init_b = tmpl_p["heads"]["hm"]["out"]["bias"].copy()
    out = load_model(path, tmpl_p, tmpl_s, reuse_hm=True, verbose=False)
    got_k = out["params"]["heads"]["hm"]["out"]["kernel"]
    got_b = out["params"]["heads"]["hm"]["out"]["bias"]
    np.testing.assert_array_equal(
        got_k[..., :3], p["heads"]["hm"]["out"]["kernel"])
    np.testing.assert_array_equal(got_k[..., 3:], init_k[..., 3:])
    np.testing.assert_array_equal(got_b[:3],
                                  p["heads"]["hm"]["out"]["bias"])
    np.testing.assert_array_equal(got_b[3:], init_b[3:])


def test_reset_hm_forces_reinit(tmp_path):
    """reset_hm: an hm head loaded from a generic 1/80-class pretrain is
    re-initialized even when shapes match."""
    p, s = _ckpt_trees(1)
    path = str(tmp_path / "pretrain1.ckpt")
    save_model(path, 0, p, s)
    tmpl_p, tmpl_s = _ckpt_trees(1)
    init_k = tmpl_p["heads"]["hm"]["out"]["kernel"].copy()
    out = load_model(path, tmpl_p, tmpl_s, reset_hm=True, verbose=False)
    np.testing.assert_array_equal(
        out["params"]["heads"]["hm"]["out"]["kernel"], init_k)
    # non-hm heads still load
    np.testing.assert_array_equal(
        out["params"]["heads"]["wh"]["out"]["kernel"],
        p["heads"]["wh"]["out"]["kernel"])


def test_missing_and_extra_keys(tmp_path):
    p, s = _ckpt_trees(2)
    p["heads"]["extra"] = {"out": {"bias": np.ones(2, np.float32)}}
    del p["heads"]["wh"]
    path = str(tmp_path / "odd.ckpt")
    save_model(path, 0, p, s)
    tmpl_p, tmpl_s = _ckpt_trees(2)
    init_wh = tmpl_p["heads"]["wh"]["out"]["kernel"].copy()
    out = load_model(path, tmpl_p, tmpl_s, verbose=False)
    # missing in ckpt -> keep init; extra in ckpt -> dropped silently
    np.testing.assert_array_equal(
        out["params"]["heads"]["wh"]["out"]["kernel"], init_wh)
    assert "extra" not in out["params"]["heads"]
