"""Trained-weight, serving-resolution behavioral parity vs the
reference (VERDICT r3 item 7).

Loads the committed TRAINED exact-DCN checkpoint
(assets/selftest_dcn_fp16.ckpt), maps it onto the reference's torch
model with the inverse weight converter, and runs BOTH full pipelines
(reference: src/lib/detector.py:55-172 in torch CPU vs
engine/detector.Detector) at 544x960 on synthetic 1080p frames in the
checkpoint's training domain — so this exercises non-random BN
statistics, trained offset fields, and real track association at the
MOT17 serving resolution (reference: readme/MODEL_ZOO.md:16, 544x960).

Complements tests/test_full_pipeline_parity.py (random weights,
256x448, real video): between them, trained-vs-random x small-vs-full
resolution are all covered.

Marked slow: exact-DCN dla_34 at 544x960 on the CPU backend.
Run with: pytest tests/test_trained_fullres_parity.py -m slow
"""

import os
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(ROOT, "assets", "selftest_dcn_fp16.ckpt")
IN_H, IN_W = 544, 960
N_FRAMES = 4
TRACK_THRESH = 0.3

pytestmark = pytest.mark.slow


def _load_ckpt():
    with open(CKPT, "rb") as f:
        d = pickle.load(f)

    def cast(t):
        if isinstance(t, dict):
            return {k: cast(v) for k, v in t.items()}
        a = np.asarray(t)
        return a.astype(np.float32) if a.dtype == np.float16 else a

    return cast(d["params"]), cast(d["batch_stats"])


def _frames():
    import sys
    sys.path.insert(0, ROOT)
    from bench import synth_frames

    return synth_frames(N_FRAMES, seed=3)


@pytest.fixture(scope="module")
def both_results(tmp_path_factory):
    if not os.path.exists(CKPT):
        pytest.skip("trained checkpoint missing")
    tmp = tmp_path_factory.mktemp("fullres")
    params, stats = _load_ckpt()
    frames = _frames()

    # ---- reference side: inverse-convert and run the torch pipeline
    from tests.ref_pipeline import (build_reference_detector,
                                    build_reference_opt, install_stubs)

    install_stubs()
    args = ["tracking", "--dataset", "custom",
            "--custom_dataset_ann_path", "", "--custom_dataset_img_path",
            "", "--num_classes", "1",
            "--input_h", str(IN_H), "--input_w", str(IN_W),
            "--gpus", "-1", "--pre_hm",
            "--track_thresh", str(TRACK_THRESH),
            "--new_thresh", str(TRACK_THRESH), "--max_age", "3"]
    opt = build_reference_opt(args)

    import importlib

    from tests.torch_ref import DCN

    dla = importlib.import_module("model.networks.dla")
    dla.DCN = DCN
    dla.DLA.load_pretrained_model = lambda self, **k: None
    from model.model import create_model as ref_create_model

    model = ref_create_model(opt.arch, opt.heads, opt.head_conv, opt=opt)
    template_sd = {k: v.numpy() for k, v in model.state_dict().items()}

    from centertrack_tpu.tools.convert_torch_weights import (
        convert_dla34, invert_to_torch)

    back = invert_to_torch(params, stats, template_sd, convert_dla34)
    model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         if isinstance(v, np.ndarray) else v for k, v in back.items()})
    ckpt_pth = str(tmp / "inverted.pth")
    torch.save({"epoch": 30, "state_dict": model.state_dict()}, ckpt_pth)
    opt.load_model = ckpt_pth
    det = build_reference_detector(opt)
    ref_results = [det.run(f.copy())["results"] for f in frames]

    # ---- our side: the committed checkpoint as-is
    from centertrack_tpu.config import Config, parse_task, set_heads
    from centertrack_tpu.engine.detector import Detector

    class Meta:
        num_categories = 1
        default_resolution = [IN_H, IN_W]
        num_joints = 17
        rest_focal_length = 1200
        flip_idx = []
        mean = np.array([0.40789654, 0.44719302, 0.47026115], np.float32)
        std = np.array([0.28863828, 0.27408164, 0.27809835], np.float32)

    cfg = Config(task="tracking", pre_hm=True, input_h=IN_H, input_w=IN_W,
                 num_classes=1, track_thresh=TRACK_THRESH,
                 new_thresh=TRACK_THRESH, max_age=3, dla_node="dcn")
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, Meta)
    our_det = Detector(cfg, params=params, batch_stats=stats,
                       dataset_meta=Meta)
    our_results = [our_det.run(f)["results"] for f in frames]
    return ref_results, our_results


def _centers(dets):
    return np.asarray([
        [(d["bbox"][0] + d["bbox"][2]) / 2,
         (d["bbox"][1] + d["bbox"][3]) / 2] for d in dets], np.float32)


def test_trained_fullres_detection_parity(both_results):
    ref_results, our_results = both_results
    assert any(len([d for d in rr if d["score"] > TRACK_THRESH]) > 0
               for rr in ref_results), \
        "trained checkpoint detects nothing on its training domain"
    for fi, (rr, orr) in enumerate(zip(ref_results, our_results)):
        rr = [d for d in rr if d["score"] > TRACK_THRESH]
        orr = [d for d in orr if d["score"] > TRACK_THRESH]
        assert abs(len(rr) - len(orr)) <= 1, \
            f"frame {fi}: det count {len(rr)} vs {len(orr)}"
        if not rr or not orr:
            continue
        rc, oc = _centers(rr), _centers(orr)
        dist = np.linalg.norm(rc[:, None] - oc[None], axis=2)
        nn = dist.argmin(axis=1)
        for i, d in enumerate(rr):
            j = int(nn[i])
            # trained peaks are sharp: centers must coincide closely at
            # 1080p image scale (down_ratio 4 -> 1 output px = 8 px)
            assert dist[i, j] < 8.0, \
                f"frame {fi} det {i}: nearest center {dist[i, j]:.2f}px"
            o = orr[j]
            assert d["class"] == o["class"]
            assert abs(d["score"] - o["score"]) < 5e-3, \
                f"frame {fi} det {i}: score {d['score']} vs {o['score']}"
            bb = np.abs(np.asarray(d["bbox"]) - np.asarray(o["bbox"]))
            assert bb.max() < 8.0, \
                f"frame {fi} det {i}: bbox diff {bb.max():.2f}px"


def test_trained_fullres_id_bijection(both_results):
    ref_results, our_results = both_results
    fwd, bwd, matched = {}, {}, 0
    for fi, (rr, orr) in enumerate(zip(ref_results, our_results)):
        rr = [d for d in rr if d["score"] > TRACK_THRESH]
        orr = [d for d in orr if d["score"] > TRACK_THRESH]
        if not rr or not orr:
            continue
        rc, oc = _centers(rr), _centers(orr)
        dist = np.linalg.norm(rc[:, None] - oc[None], axis=2)
        nn = dist.argmin(axis=1)
        for i, d in enumerate(rr):
            j = int(nn[i])
            if dist[i, j] >= 8.0:
                continue
            ra, ob = d["tracking_id"], orr[j]["tracking_id"]
            assert fwd.setdefault(ra, ob) == ob, \
                f"frame {fi}: ref id {ra} -> both {fwd[ra]} and {ob}"
            assert bwd.setdefault(ob, ra) == ra, \
                f"frame {fi}: our id {ob} -> both {bwd[ob]} and {ra}"
            matched += 1
    assert matched > 0, "no matched tracks at all"
