"""Pinned-behavior tests for the augmentation / target-building code in
data/generic.py.

The dataset math must match the reference semantics
(reference: src/lib/dataset/generic_dataset.py) but is expressed
vectorized here; these tests pin the behavior two ways:

  1. fingerprint goldens captured from the pipeline on a fixed-seed
     synthetic dataset (guards any future restructuring);
  2. unit tests of color_aug / _flip_anns / _add_hps / _add_rot against
     straightforward scalar-loop spec implementations written inline.
"""

import dataclasses

import numpy as np
import pytest

from centertrack_tpu.config import Config, parse_task, set_heads
from centertrack_tpu.data.generic import GenericDataset, color_aug
from tests.fixtures import make_tiny_tracking_dataset


class TinyDataset(GenericDataset):
    num_categories = 1
    default_resolution = [64, 96]
    class_name = ["thing"]
    max_objs = 8
    cat_ids = {1: 1}


# (sum, abs-sum) of selected ret arrays for train items 0/3/5 with
# np.random.seed(1000+idx) and data_rng=RandomState(idx). Captured from
# the round-1 implementation; the vectorized rewrite must reproduce the
# identical RNG stream and outputs.
GOLDEN = {
    "0:cat": (0.000000, 0.000000),
    "0:hm_cts": (48.000000, 48.000000),
    "0:hm_radii": (2.000000, 2.000000),
    "0:image": (12633.792166, 23061.354876),
    "0:ind": (393.000000, 393.000000),
    "0:mask": (2.000000, 2.000000),
    "0:meta_c": (78.000000, 78.000000),
    "0:meta_s": (172.800003, 172.800003),
    "0:pre_cts_int": (195.000000, 195.000000),
    "0:pre_img": (13686.879857, 20741.580032),
    "0:pre_ks": (1.000000, 1.000000),
    "0:reg": (1.999997, 1.999997),
    "0:tracking": (1.708694, 2.153138),
    "0:wh": (20.000000, 20.000000),
    "3:cat": (0.000000, 0.000000),
    "3:hm_cts": (43.000000, 43.000000),
    "3:hm_radii": (2.000000, 2.000000),
    "3:image": (-2370.974953, 21912.803663),
    "3:ind": (457.000000, 457.000000),
    "3:mask": (2.000000, 2.000000),
    "3:meta_c": (82.000000, 82.000000),
    "3:meta_s": (211.199997, 211.199997),
    "3:pre_cts_int": (181.000000, 181.000000),
    "3:pre_img": (-2380.287727, 20669.269885),
    "3:pre_ks": (1.000000, 1.000000),
    "3:reg": (2.000000, 2.000000),
    "3:tracking": (2.562412, 4.411683),
    "3:wh": (16.363636, 16.363636),
    "5:cat": (0.000000, 0.000000),
    "5:hm_cts": (28.000000, 28.000000),
    "5:hm_radii": (2.000000, 2.000000),
    "5:image": (28586.604081, 33705.940245),
    "5:ind": (281.000000, 281.000000),
    "5:mask": (2.000000, 2.000000),
    "5:meta_c": (70.000000, 70.000000),
    "5:meta_s": (172.800003, 172.800003),
    "5:pre_cts_int": (142.000000, 142.000000),
    "5:pre_img": (27238.545591, 35393.607920),
    "5:pre_ks": (2.000000, 2.000000),
    "5:reg": (2.000000, 2.000000),
    "5:tracking": (7.555555, 7.555555),
    "5:wh": (20.000000, 20.000000),
}


def make_cfg(**kw):
    kw.setdefault("hm_disturb", 0.05)
    kw.setdefault("lost_disturb", 0.2)
    kw.setdefault("fp_disturb", 0.1)
    cfg = Config(task="tracking", dataset="custom", pre_hm=True, **kw)
    cfg = parse_task(cfg)
    return set_heads(cfg, TinyDataset)


def test_train_pipeline_fingerprints(tmp_path):
    ann_path, img_dir = make_tiny_tracking_dataset(str(tmp_path))
    ds = TinyDataset(make_cfg(), "train", ann_path, img_dir)
    state = np.random.get_state()
    for idx in (0, 3, 5):
        np.random.seed(1000 + idx)
        ds._data_rng = np.random.RandomState(idx)
        ret = ds[idx]
        for key in sorted(GOLDEN):
            gidx, name = key.split(":")
            if int(gidx) != idx:
                continue
            v = np.asarray(ret[name], np.float64)
            want_sum, want_abs = GOLDEN[key]
            np.testing.assert_allclose(v.sum(), want_sum, rtol=2e-3,
                                       atol=1e-3, err_msg=key)
            np.testing.assert_allclose(np.abs(v).sum(), want_abs,
                                       rtol=2e-3, atol=1e-3, err_msg=key)
    np.random.set_state(state)


def _color_aug_spec(data_rng, image, eig_val, eig_vec):
    """Straightforward scalar-loop CornerNet color aug (the reference's
    expression: utils/image.py:211-243), for equivalence testing."""
    import cv2
    image = image.copy()
    gs = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
    gs_mean = gs.mean()

    def blend(alpha, target):
        nonlocal image
        image = image * alpha + target * (1 - alpha)

    fns = [
        lambda a: blend(a, np.zeros(()) if False else 0 * image) or None,
        lambda a: blend(a, np.full_like(image, gs_mean)),
        lambda a: blend(a, np.repeat(gs[:, :, None], 3, axis=2)),
    ]
    # brightness is pure scaling (blend with 0)
    for i in data_rng.permutation(3):
        alpha = 1.0 + data_rng.uniform(low=-0.4, high=0.4)
        if i == 0:
            image = image * alpha
        else:
            fns[i](alpha)
    image = image + (eig_vec @ (eig_val * data_rng.normal(
        scale=0.1, size=(3,)))).astype(np.float32)
    return image


def test_color_aug_matches_spec():
    rng = np.random.RandomState(7)
    img = rng.rand(16, 24, 3).astype(np.float32)
    eig_val = GenericDataset._eig_val
    eig_vec = GenericDataset._eig_vec
    for seed in range(5):
        got = color_aug(np.random.RandomState(seed), img.copy(),
                        eig_val, eig_vec)
        want = _color_aug_spec(np.random.RandomState(seed), img,
                               eig_val, eig_vec)
        np.testing.assert_allclose(got, want, atol=1e-5)


def _hps_cfg():
    class KPDataset(TinyDataset):
        num_categories = 1
        num_joints = 17

    cfg = Config(task="multi_pose", dataset="custom")
    cfg = parse_task(cfg)
    return set_heads(cfg, KPDataset), KPDataset


def test_flip_anns_all_fields():
    cfg, cls = _hps_cfg()
    # widen head dict so rot/amodel/velocity branches engage
    heads = dict(cfg.heads_dict)
    heads.update({"rot": 8, "amodel_offset": 2})
    cfg = dataclasses.replace(cfg, heads=tuple(heads.items()),
                              velocity=True)
    ds = cls.__new__(cls)
    ds.cfg = cfg

    width = 100
    kps = np.zeros((17, 3), np.float32)
    kps[:, 0] = np.arange(17) * 2.0
    kps[:, 1] = np.arange(17) * 3.0
    kps[:, 2] = 2
    ann = {
        "bbox": [10.0, 5.0, 30.0, 40.0],
        "keypoints": kps.reshape(-1).tolist(),
        "alpha": 0.7,
        "amodel_center": [42.0, 17.0],
        "velocity": [1.0, 2.0, 3.0],
    }
    ann2 = {"bbox": [0.0, 0.0, 9.0, 9.0], "alpha": -2.9}
    out = ds._flip_anns([ann, ann2], width)

    # bbox: x -> W - 1 - x - w
    assert out[0]["bbox"] == [100 - 1 - 10 - 30, 5.0, 30.0, 40.0]
    assert out[1]["bbox"] == [100 - 1 - 0 - 9, 0.0, 9.0, 9.0]
    # keypoints: x flipped then left/right joints swapped
    got = np.array(out[0]["keypoints"], np.float32).reshape(17, 3)
    want = kps.copy()
    want[:, 0] = width - 1 - want[:, 0]
    for a, b in GenericDataset.flip_idx:
        want[[a, b]] = want[[b, a]]
    np.testing.assert_allclose(got, want)
    # alpha: pi - a for a > 0, -pi - a otherwise
    assert abs(out[0]["alpha"] - (np.pi - 0.7)) < 1e-6
    assert abs(out[1]["alpha"] - (-np.pi + 2.9)) < 1e-6
    # amodel center x flipped; velocity invalidated
    assert out[0]["amodel_center"][0] == width - 1 - 42.0
    assert out[0]["velocity"] == [-10000, -10000, -10000]


def test_add_hps_visibility_classes():
    cfg, cls = _hps_cfg()
    ds = cls.__new__(cls)
    ds.cfg = cfg
    ds.max_objs = 4
    ds.num_joints = 17
    ret = {}
    ds._init_ret(ret)

    trans = np.array([[0.5, 0, 0], [0, 0.5, 0]], np.float32)  # /2 scale
    kps = np.zeros((17, 3), np.float32)
    kps[0] = [10.0, 12.0, 2]   # visible, in bounds
    kps[1] = [11.0, 13.0, 1]   # labeled-invisible, in bounds
    kps[2] = [0.0, 0.0, 0]     # unlabeled
    kps[3] = [1000.0, 2.0, 2]  # visible but out of bounds
    ann = {"keypoints": kps.reshape(-1).tolist()}
    ct_int = np.array([4, 5], np.int32)
    bbox = np.array([2, 3, 8, 9], np.float32)
    ds._add_hps(ret, 0, ann, trans, ct_int, bbox, 6.0, 6.0)

    # joint 0: full supervision
    np.testing.assert_allclose(ret["hps"][0, :2], [5 - 4, 6 - 5])
    assert ret["hps_mask"][0, 0] == 1 and ret["hm_hp_mask"][0] == 1
    assert ret["hp_ind"][0] == 6 * cfg.output_w + 5
    assert ret["hm_hp_splat_valid"][0] and not \
        ret["hm_hp_point_ignore_valid"][0]
    # joint 1: splat exists but masked out of losses + point ignore
    assert ret["hm_hp_splat_valid"][1]
    assert ret["hm_hp_mask"][1] == 0 and ret["hp_offset_mask"][1][0] == 0
    assert ret["hm_hp_point_ignore_valid"][1]
    # joint 2 unlabeled: whole-box ignore region recorded for joint 2
    assert ret["hm_hp_ignore_valid"][0]
    assert ret["hm_hp_ignore_joint"][0] == 2
    np.testing.assert_allclose(ret["hm_hp_ignore_boxes"][0], bbox)
    # joint 3 out of bounds: nothing written
    assert not ret["hm_hp_splat_valid"][3]
    assert ret["hps_mask"][0, 6] == 0


@pytest.mark.parametrize("alpha,bins", [
    (0.0, (1, 1)),          # both bins
    (-np.pi / 2, (1, 0)),   # bin 0 only
    (np.pi / 2, (0, 1)),    # bin 1 only
    (np.pi, (1, 1)),
])
def test_add_rot_bins(alpha, bins):
    cfg, cls = _hps_cfg()
    heads = dict(cfg.heads_dict)
    heads["rot"] = 8
    cfg = dataclasses.replace(cfg, heads=tuple(heads.items()))
    ds = cls.__new__(cls)
    ds.cfg = cfg
    ds.max_objs = 2
    ds.num_joints = 17
    ret = {}
    ds._init_ret(ret)
    ds._add_rot(ret, {"alpha": alpha}, 0)
    assert ret["rot_mask"][0] == 1
    np.testing.assert_array_equal(ret["rotbin"][0], bins)
    if bins[0]:
        np.testing.assert_allclose(ret["rotres"][0, 0],
                                   alpha + 0.5 * np.pi)
    if bins[1]:
        np.testing.assert_allclose(ret["rotres"][0, 1],
                                   alpha - 0.5 * np.pi)
