"""Train-time debug visualization writes pred-vs-GT images
(reference: src/lib/trainer.py:191-311 at --debug > 0)."""

import os

import numpy as np

from tests.test_trainer import Meta, make_trainer, tiny_batch


class _VizMeta(Meta):
    mean = (0.4, 0.4, 0.4)
    std = (0.28, 0.28, 0.28)
    class_name = ["obj"]


def test_debug_iter_writes_images(tmp_path):
    trainer, cfg = make_trainer(debug=2)
    trainer.dataset_meta = _VizMeta
    trainer.debug_dir = str(tmp_path)
    batch = tiny_batch()
    trainer._debug_iter(batch, "val_e1_it0")
    names = sorted(os.listdir(tmp_path))
    assert names, "no debug images written"
    expect = {"pred_hm", "gt_hm", "out_pred", "out_gt",
              "pre_img_pred", "pre_img_gt", "pre_hm"}
    stems = {n.split("val_e1_it0")[-1].strip("_.png").strip("_")
             for n in names}
    missing = {e for e in expect
               if not any(e in n for n in names)}
    assert not missing, (missing, names)
    import cv2

    img = cv2.imread(str(tmp_path / names[0]))
    assert img is not None and img.shape[0] == cfg.input_h


def test_run_epoch_triggers_debug(tmp_path):
    trainer, cfg = make_trainer(debug=2)
    trainer.dataset_meta = _VizMeta
    trainer.debug_dir = str(tmp_path)
    loader = [tiny_batch()]
    trainer.val(1, loader, log_every=1)
    assert os.listdir(tmp_path)
