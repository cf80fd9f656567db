"""Annotation-tool logic (reference: src/tools/annot_bbox.py)."""

import json
import os

import numpy as np

from centertrack_tpu.tools.annot_bbox import (
    add_image_annotations, extreme_points_to_bbox,
    load_or_init_annotations, save_txt, sort_extreme_points)


def test_sort_and_bbox():
    pts = [[10, 50], [30, 5], [60, 40], [5, 20]]
    expt = sort_extreme_points(pts)
    assert expt[0] == [30, 5]    # topmost
    assert expt[1] == [5, 20]    # leftmost
    assert expt[2] == [10, 50]   # bottommost
    assert expt[3] == [60, 40]   # rightmost
    assert extreme_points_to_bbox(expt) == [5, 5, 60, 50]


def test_save_txt_and_json(tmp_path):
    expt_cls = [[[30, 5], [5, 20], [10, 50], [60, 40], 2]]
    txt = str(tmp_path / "img1.txt")
    save_txt(txt, expt_cls)
    rows = np.loadtxt(txt, np.int64).reshape(-1, 9)
    assert rows.shape == (1, 9) and rows[0, 8] == 2

    anns = load_or_init_annotations(str(tmp_path / "missing.json"),
                                    ["cat", "dog"])
    assert [c["name"] for c in anns["categories"]] == ["cat", "dog"]
    add_image_annotations(anns, "img1.jpg", expt_cls)
    assert anns["images"][0]["id"] == 1
    a = anns["annotations"][0]
    assert a["category_id"] == 2
    assert a["bbox"] == [5, 5, 55, 45]  # xywh
    # round-trips through json
    p = str(tmp_path / "annotations.json")
    with open(p, "w") as f:
        json.dump(anns, f)
    assert load_or_init_annotations(p, [])["annotations"]
