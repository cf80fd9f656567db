"""End-to-end behavioral parity vs the reference on REAL video frames.

Runs the reference's entire inference loop (cv2 pre-process -> DLASeg
-> decode -> post_process -> greedy Tracker; src/lib/detector.py:55-172)
in torch on frames of /root/reference/videos/nuscenes_mini.mp4, then
runs engine/detector.Detector with the SAME converted weights on the
same frames, and asserts per-frame box/score/class/track-id parity.

This is the strongest MOTA-parity proxy available without dataset
downloads: it exercises the resampler (cv2 vs ops/warp), normalization,
the full DCN network, decode, inverse-affine post-process, threshold
coupling, and greedy association with real image statistics.

Matching is by center nearest-neighbor, NOT score rank: with randomized
weights many peaks tie to ~1e-4, and sub-float-tolerance score noise
legitimately swaps their sort order on either side.

Marked slow: the torch side takes ~20 s and the JAX side's 256x448
dla_34(dcn) CPU compile takes minutes cold (seconds warm via the
persistent cache). Run with: pytest tests/ -m slow
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

VIDEO = "/root/reference/videos/nuscenes_mini.mp4"
N_FRAMES = 6
IN_H, IN_W = 256, 448
TRACK_THRESH = 0.05

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def both_results(tmp_path_factory):
    if not os.path.exists(VIDEO):
        pytest.skip("reference video unavailable")
    tmp = tmp_path_factory.mktemp("parity")
    ckpt = str(tmp / "ref_rand.pth")
    ours = str(tmp / "ref_rand_jax.ckpt")

    from tests.ref_pipeline import (build_reference_detector,
                                    build_reference_opt, install_stubs,
                                    video_frames)

    install_stubs()
    frames = video_frames(VIDEO, N_FRAMES)
    assert len(frames) == N_FRAMES

    args = ["tracking", "--dataset", "mot", "--gpus", "-1", "--pre_hm",
            "--input_h", str(IN_H), "--input_w", str(IN_W),
            "--track_thresh", str(TRACK_THRESH),
            "--load_model", ckpt]
    opt = build_reference_opt(args)

    # the exact model the reference Detector builds, randomized
    import importlib

    from tests.torch_ref import DCN, randomize_

    dla = importlib.import_module("model.networks.dla")
    dla.DCN = DCN
    from model.model import create_model as ref_create_model

    model = ref_create_model(opt.arch, opt.heads, opt.head_conv, opt=opt)
    randomize_(model, seed=0, offset_scale=0.05)
    torch.save({"epoch": 1, "state_dict": model.state_dict()}, ckpt)

    det = build_reference_detector(opt)
    ref_results = [det.run(f.copy())["results"] for f in frames]

    # convert the checkpoint and run our pipeline
    from centertrack_tpu.models.model import save_model
    from centertrack_tpu.tools.convert_torch_weights import convert_dla34

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params, stats, unused = convert_dla34(sd)
    assert not unused, unused[:5]
    save_model(ours, 1, params, stats)

    from centertrack_tpu.config import Config, parse_task, set_heads
    from centertrack_tpu.data.registry import get_dataset_meta
    from centertrack_tpu.engine.detector import Detector

    cfg = Config(task="tracking", dataset="mot", input_h=IN_H,
                 input_w=IN_W, track_thresh=TRACK_THRESH, pre_hm=True,
                 dla_node="dcn", load_model=ours)
    cfg = parse_task(cfg)
    cfg = set_heads(cfg, get_dataset_meta("mot", cfg))
    our_det = Detector(cfg)
    our_results = [our_det.run(f)["results"] for f in frames]
    return ref_results, our_results


def _centers(dets):
    return np.asarray([
        [(d["bbox"][0] + d["bbox"][2]) / 2,
         (d["bbox"][1] + d["bbox"][3]) / 2] for d in dets], np.float32)


def test_per_frame_detection_parity(both_results):
    ref_results, our_results = both_results
    for fi, (rr, orr) in enumerate(zip(ref_results, our_results)):
        rr = [d for d in rr if d["score"] > TRACK_THRESH]
        orr = [d for d in orr if d["score"] > TRACK_THRESH]
        assert abs(len(rr) - len(orr)) <= 2, \
            f"frame {fi}: det count {len(rr)} vs {len(orr)}"
        rc, oc = _centers(rr), _centers(orr)
        dist = np.linalg.norm(rc[:, None] - oc[None], axis=2)
        nn = dist.argmin(axis=1)
        for i, d in enumerate(rr):
            j = int(nn[i])
            assert dist[i, j] < 1.0, \
                f"frame {fi} det {i}: nearest center {dist[i, j]:.2f}px"
            o = orr[j]
            assert d["class"] == o["class"]
            assert abs(d["score"] - o["score"]) < 2e-3, \
                f"frame {fi} det {i}: score {d['score']} vs {o['score']}"
            bb = np.abs(np.asarray(d["bbox"]) - np.asarray(o["bbox"]))
            assert bb.max() < 2.0, \
                f"frame {fi} det {i}: bbox diff {bb.max():.2f}px"


def test_track_id_bijection(both_results):
    """Track identities must correspond 1:1 across the WHOLE clip —
    association decisions (birth, match, death) happened identically."""
    ref_results, our_results = both_results
    fwd = {}
    bwd = {}
    for fi, (rr, orr) in enumerate(zip(ref_results, our_results)):
        rr = [d for d in rr if d["score"] > TRACK_THRESH]
        orr = [d for d in orr if d["score"] > TRACK_THRESH]
        rc, oc = _centers(rr), _centers(orr)
        if len(rr) == 0 or len(orr) == 0:
            continue
        dist = np.linalg.norm(rc[:, None] - oc[None], axis=2)
        nn = dist.argmin(axis=1)
        for i, d in enumerate(rr):
            j = int(nn[i])
            if dist[i, j] >= 1.0:
                continue
            ra, ob = d["tracking_id"], orr[j]["tracking_id"]
            assert fwd.setdefault(ra, ob) == ob, \
                f"frame {fi}: ref id {ra} mapped to both {fwd[ra]} and {ob}"
            assert bwd.setdefault(ob, ra) == ra, \
                f"frame {fi}: our id {ob} mapped to both {bwd[ob]} and {ra}"
    assert fwd, "no matched tracks at all"
