"""CLI end-to-end: train -> resume -> evaluate, through the real CLIs.

Drives `cli.main` (the training entry, reference: src/main.py:28-97) for
two epochs on a tiny synthetic MOT domain, checks the model_last /
model_N checkpoint plumbing and periodic val, resumes for a third epoch
(reference resume semantics: opts.py resume -> model_last.ckpt with
optimizer state), then runs `cli.test`'s sequential per-video path
(reference: src/test.py:53-179) with --load_model + --save_results and
scores the saved tracking output with the hermetic CLEAR-MOT evaluator.

Assertions are structural (checkpoints advance, every image gets a
result, metrics are finite): three tiny-backbone epochs don't produce a
meaningful MOTA, and quality is already pinned by tools/selftest and
tests/parity_mota. Marked slow: a few minutes cold on the CPU backend.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from centertrack_tpu.models.model import load_model
from centertrack_tpu.tools.selftest import make_dataset

pytestmark = pytest.mark.slow


def _common_argv(ann_path, img_dir):
    return [
        "tracking",
        "--dataset", "custom",
        "--custom_dataset_ann_path", ann_path,
        "--custom_dataset_img_path", img_dir,
        "--num_classes", "1",
        "--input_h", "96", "--input_w", "160",
        "--arch", "generic", "--backbone", "tiny", "--dla_node", "conv",
        "--batch_size", "4", "--num_workers", "1",
        "--pre_hm", "--same_aug_pre", "--not_rand_crop", "--flip", "0",
        "--track_thresh", "0.05", "--new_thresh", "0.05",
        "--exp_id", "e2e",
    ]


@pytest.fixture(scope="module")
def domain(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_e2e")
    ann_path, img_dir = make_dataset(
        str(root), num_videos=2, frames=6, seed=3)
    return str(root), ann_path, img_dir


def test_cli_train_resume_eval(domain, monkeypatch):
    from centertrack_tpu.cli import main as cli_main
    from centertrack_tpu.cli import test as cli_test

    root, ann_path, img_dir = domain
    monkeypatch.chdir(root)  # cli writes to ./exp/<task>/<exp_id>
    argv = _common_argv(ann_path, img_dir)

    # -- train 2 epochs with val every epoch ---------------------------
    cli_main.main(argv + ["--num_epochs", "2", "--val_intervals", "1"])
    save_dir = os.path.join(root, "exp", "tracking", "e2e")
    last = os.path.join(save_dir, "model_last.ckpt")
    assert os.path.exists(last)
    ckpt = load_model(last)
    assert ckpt["epoch"] == 2
    assert ckpt.get("opt_state") is not None  # resume needs it
    # periodic val checkpoints (cli.main:85-92)
    assert os.path.exists(os.path.join(save_dir, "model_1.ckpt"))
    assert os.path.exists(os.path.join(save_dir, "model_2.ckpt"))
    assert os.path.exists(os.path.join(save_dir, "opt.txt"))
    import glob
    assert glob.glob(os.path.join(save_dir, "logs_*", "log.txt"))

    # -- resume for one more epoch -------------------------------------
    cli_main.main(argv + ["--num_epochs", "3", "--val_intervals", "1",
                          "--resume"])
    ckpt2 = load_model(last)
    assert ckpt2["epoch"] == 3
    # epoch 3 actually trained: params moved from the epoch-2 snapshot
    import jax
    l2, l3 = jax.tree.leaves(ckpt["params"]), jax.tree.leaves(
        ckpt2["params"])
    assert any(not np.allclose(a, b) for a, b in zip(l2, l3))

    # -- evaluate through cli.test (sequential detector path) ----------
    cli_test.main(argv + ["--load_model", last, "--save_results"])
    res_path = os.path.join(save_dir, "save_results_custom.json")
    assert os.path.exists(res_path)
    with open(res_path) as f:
        results = {int(k): v for k, v in json.load(f).items()}
    with open(ann_path) as f:
        db = json.load(f)
    assert set(results) == {im["id"] for im in db["images"]}

    # -- score the saved output with the hermetic CLEAR-MOT stack ------
    from centertrack_tpu.eval.mot_metrics import (MOTAccumulator,
                                                  combine_metrics)
    gt_by_image = {}
    for a in db["annotations"]:
        gt_by_image.setdefault(a["image_id"], []).append(a)
    by_video = {}
    for im in db["images"]:
        by_video.setdefault(im["video_id"], []).append(im)
    accs, summaries = {}, {}
    for vid, ims in sorted(by_video.items()):
        acc = MOTAccumulator()
        for im in sorted(ims, key=lambda x: x["frame_id"]):
            dets = [r for r in results[im["id"]]
                    if r.get("active", 1) and r["score"] > 0.05]
            gts = gt_by_image.get(im["id"], [])
            acc.update(
                [g["track_id"] for g in gts],
                np.array([g["bbox"] for g in gts]).reshape(-1, 4),
                [r["tracking_id"] for r in dets],
                np.array([[r["bbox"][0], r["bbox"][1],
                           r["bbox"][2] - r["bbox"][0],
                           r["bbox"][3] - r["bbox"][1]]
                          for r in dets]).reshape(-1, 4))
        accs[f"v{vid}"] = acc
        summaries[f"v{vid}"] = acc.metrics()
    overall = combine_metrics(summaries, accs)
    assert np.isfinite(overall["mota"])
    assert np.isfinite(overall["idf1"])
