import numpy as np
import jax.numpy as jnp
import pytest

from centertrack_tpu.config import Config, parse_task, set_heads
from centertrack_tpu.data.generic import GenericDataset
from centertrack_tpu.data.render import render_batch
from centertrack_tpu.ops.gaussian import draw_umich_gaussian
from tests.fixtures import make_tiny_tracking_dataset


class TinyDataset(GenericDataset):
    num_categories = 1
    default_resolution = [64, 96]
    class_name = ["thing"]
    max_objs = 8
    cat_ids = {1: 1}


def make_cfg(**kw):
    kw.setdefault("hm_disturb", 0.05)
    kw.setdefault("lost_disturb", 0.2)
    kw.setdefault("fp_disturb", 0.1)
    cfg = Config(task="tracking", dataset="custom", pre_hm=True, **kw)
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, TinyDataset)
    return cfg


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("tinydata")
    return make_tiny_tracking_dataset(str(root))


def test_getitem_shapes(tiny_data):
    ann_path, img_dir = tiny_data
    cfg = make_cfg()
    ds = TinyDataset(cfg, "train", ann_path, img_dir)
    assert len(ds) == 8
    # the random crop can legitimately push an object out of view —
    # pin the stream so both objects stay visible deterministically
    state = np.random.get_state()
    np.random.seed(11)
    ret = ds[0]
    np.random.set_state(state)
    assert ret["image"].shape == (64, 96, 3)
    assert ret["pre_img"].shape == (64, 96, 3)
    assert ret["ind"].shape == (8,)
    assert ret["tracking"].shape == (8, 2)
    assert ret["hm_cts"].shape == (8, 2)
    assert ret["pre_cts_int"].shape == (16, 2)
    # two live objects
    assert ret["mask"].sum() == 2
    assert ret["hm_valid"].sum() == 2


def test_val_uses_exact_prev_frame(tiny_data):
    ann_path, img_dir = tiny_data
    cfg = make_cfg()
    ds = TinyDataset(cfg, "val", ann_path, img_dir)
    ret = ds[1]  # frame 2 -> prev must be frame 1
    assert ret["image"].shape == (64, 96, 3)


def test_render_batch_matches_host(tiny_data):
    ann_path, img_dir = tiny_data
    cfg = make_cfg(no_color_aug=True)
    ds = TinyDataset(cfg, "val", ann_path, img_dir)
    ret = ds[0]
    batch = {k: np.asarray(v)[None] for k, v in ret.items()
             if isinstance(v, np.ndarray) or np.isscalar(v)}
    rendered = render_batch(batch, cfg)
    assert rendered["hm"].shape == (1, 16, 24, 1)
    assert rendered["pre_hm"].shape == (1, 64, 96, 1)

    # host re-render from the splat arrays must match
    hm_ref = np.zeros((16, 24), np.float32)
    for i in range(ret["hm_valid"].shape[0]):
        if ret["hm_valid"][i]:
            draw_umich_gaussian(hm_ref, ret["hm_cts"][i],
                                int(ret["hm_radii"][i]))
    np.testing.assert_allclose(
        np.asarray(rendered["hm"])[0, :, :, 0], hm_ref, atol=1e-5)

    # GT indices consistent with centers
    for i in range(int(ret["mask"].sum())):
        y, x = ret["ind"][i] // 24, ret["ind"][i] % 24
        assert hm_ref[y, x] > 0.99


def test_ignore_region_rendered(tiny_data):
    ann_path, img_dir = tiny_data
    cfg = make_cfg(no_color_aug=True)
    ds = TinyDataset(cfg, "val", ann_path, img_dir)
    ret = ds[0]
    ret["ignore_boxes"][0] = [0, 0, 5, 5]
    ret["ignore_cat"][0] = -1
    ret["ignore_valid"][0] = True
    batch = {k: np.asarray(v)[None] for k, v in ret.items()}
    rendered = render_batch(batch, cfg)
    hm = np.asarray(rendered["hm"])[0, :, :, 0]
    assert (hm[0:6, 0:6] == 1.0).all()


def test_tracking_target_offsets(tiny_data):
    # tracking target = pre_ct - ct_int (reference:
    # generic_dataset.py:451-458); with zero disturb and same_aug the
    # offset should be roughly -(motion)/down_ratio.
    ann_path, img_dir = tiny_data
    cfg = make_cfg(hm_disturb=0.0, lost_disturb=0.0, fp_disturb=0.0,
                   same_aug_pre=True, no_color_aug=True)
    ds = TinyDataset(cfg, "val", ann_path, img_dir)
    ret = ds[1]  # frame 2; objects move +3x +2y per frame
    m = ret["tracking_mask"][:, 0] > 0
    assert m.sum() == 2
    t = ret["tracking"][m]
    # output res is input/4; motion -3,-2 in image px -> -0.75, -0.5
    assert np.all(np.abs(t[:, 0] + 0.75) < 0.6)
    assert np.all(np.abs(t[:, 1] + 0.5) < 0.6)


def test_render_batch_non17_joints():
    # hm_hp channel count must follow dataset_meta.num_joints, not a
    # hardcoded 17 (reference num_joints plumbing: opts.py:351-354)
    class FiveJointMeta:
        num_categories = 2
        default_resolution = [64, 96]
        num_joints = 5

    cfg = Config(task="multi_pose", dataset="custom")
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, FiveJointMeta)
    assert cfg.heads_dict["hm_hp"] == 5

    m, j = 4, 5
    batch = {
        "hm_cts": np.zeros((1, m, 2), np.int32),
        "hm_radii": np.ones((1, m), np.int32),
        "hm_valid": np.zeros((1, m), bool),
        "cat": np.zeros((1, m), np.int64),
        "ignore_boxes": np.zeros((1, 2, 4), np.float32),
        "ignore_cat": np.zeros((1, 2), np.int32),
        "ignore_valid": np.zeros((1, 2), bool),
        "hm_hp_cts": np.zeros((1, m * j, 2), np.int32),
        "hm_hp_radii": np.ones((1, m * j), np.int32),
        "hm_hp_joint": np.zeros((1, m * j), np.int32),
        "hm_hp_splat_valid": np.zeros((1, m * j), bool),
        "hm_hp_ignore_boxes": np.zeros((1, 2, 4), np.float32),
        "hm_hp_ignore_joint": np.zeros((1, 2), np.int32),
        "hm_hp_ignore_valid": np.zeros((1, 2), bool),
        "hm_hp_point_ignore": np.zeros((1, m * j, 2), np.int32),
        "hm_hp_point_ignore_joint": np.zeros((1, m * j), np.int32),
        "hm_hp_point_ignore_valid": np.zeros((1, m * j), bool),
    }
    batch["hm_cts"][0, 0] = [4, 5]
    batch["hm_valid"][0, 0] = True
    batch["hm_hp_cts"][0, 0] = [6, 7]
    batch["hm_hp_joint"][0, 0] = 3
    batch["hm_hp_splat_valid"][0, 0] = True

    rendered = render_batch(batch, cfg)
    assert rendered["hm"].shape == (1, 16, 24, 2)
    assert rendered["hm_hp"].shape == (1, 16, 24, 5)
    hp = np.asarray(rendered["hm_hp"])[0]
    assert hp[7, 6, 3] > 0.99
    assert hp[:, :, 4].max() == 0.0
