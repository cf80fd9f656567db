"""DataLoader worker modes (reference: torch DataLoader usage at
src/main.py:52-65)."""

import numpy as np
import pytest

from centertrack_tpu.config import Config, parse_task, set_heads
from centertrack_tpu.data.generic import GenericDataset
from centertrack_tpu.data.loader import DataLoader, collate
from tests.fixtures import make_tiny_tracking_dataset


class TinyDataset(GenericDataset):
    num_categories = 1
    default_resolution = [64, 96]
    class_name = ["thing"]
    max_objs = 8
    cat_ids = {1: 1}


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("loaderdata")
    ann_path, img_dir = make_tiny_tracking_dataset(str(root))
    cfg = Config(task="tracking", dataset="custom", pre_hm=True)
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, TinyDataset)
    return TinyDataset(cfg, "train", ann_path, img_dir)


@pytest.mark.parametrize("use_processes", [False, True])
def test_loader_modes(tiny_ds, use_processes):
    loader = DataLoader(tiny_ds, 4, shuffle=True, num_workers=2,
                        use_processes=use_processes, seed=99)
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    for b in batches:
        assert b["image"].shape == (4, 64, 96, 3)
        assert np.isfinite(b["image"]).all()


def test_process_mode_deterministic_across_worker_counts(tiny_ds):
    l1 = list(DataLoader(tiny_ds, 4, shuffle=True, num_workers=2,
                         use_processes=True, seed=5))
    l2 = list(DataLoader(tiny_ds, 4, shuffle=True, num_workers=3,
                         use_processes=True, seed=5))
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(a["image"], b["image"])
        np.testing.assert_array_equal(a["ind"], b["ind"])


def test_collate_stacks():
    s = [{"a": np.ones((2,)), "b": np.zeros((1, 3))} for _ in range(3)]
    out = collate(s)
    assert out["a"].shape == (3, 2) and out["b"].shape == (3, 1, 3)
