"""MultiStreamDetector must reproduce FusedDetector per stream exactly
(streams are independent; batching is a pure throughput transform)."""

import numpy as np

from centertrack_tpu.config import Config, parse_task, set_heads
from centertrack_tpu.engine.fused import FusedDetector, MultiStreamDetector


class TinyMeta:
    num_categories = 1
    default_resolution = [64, 96]
    num_joints = 17
    rest_focal_length = 1200
    flip_idx = []
    mean = np.array([0.40789654, 0.44719302, 0.47026115], np.float32)
    std = np.array([0.28863828, 0.27408164, 0.27809835], np.float32)


def _cfg():
    cfg = Config(task="tracking", pre_hm=True, track_thresh=0.001,
                 new_thresh=0.001, max_age=3, dla_node="conv", K=10,
                 arch="generic", backbone="tiny", neck="dlaup")
    cfg = parse_task(cfg)
    return set_heads(cfg, TinyMeta)


def _frames(seed, n=4):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 255, (48, 80, 3), np.uint8) for _ in range(n)]


def test_multistream_matches_single_stream():
    cfg = _cfg()
    single = FusedDetector(cfg, dataset_meta=TinyMeta)
    multi = MultiStreamDetector(cfg, streams=2,
                                params=single.params,
                                batch_stats=single.batch_stats,
                                dataset_meta=TinyMeta)
    streams = [_frames(1), _frames(2)]
    for s, frames in enumerate(streams):
        if s > 0:
            single.reset_tracking()
        singles = [FusedDetector.fetch(single.run(f), cfg.out_thresh)
                   for f in frames]
        if s == 0:
            expected = [singles]
        else:
            expected.append(singles)
    for f in range(len(streams[0])):
        lazy = multi.run([streams[0][f], streams[1][f]])
        for s in range(2):
            got = MultiStreamDetector.fetch_stream(lazy, s,
                                                   cfg.out_thresh)
            want = expected[s][f]
            assert len(got) == len(want), (s, f, len(got), len(want))
            for g, w in zip(got, want):
                assert g["tracking_id"] == w["tracking_id"]
                assert g["class"] == w["class"]
                np.testing.assert_allclose(g["bbox"], w["bbox"],
                                           rtol=1e-4, atol=1e-3)
                np.testing.assert_allclose(g["score"], w["score"],
                                           rtol=1e-4, atol=1e-5)


def test_multistream_reset_stream():
    cfg = _cfg()
    multi = MultiStreamDetector(cfg, streams=2, dataset_meta=TinyMeta)
    frames = _frames(3)
    for f in frames[:2]:
        multi.run([f, f])
    # both streams now carry identical state
    v0 = np.asarray(multi.track_state.valid)
    assert v0[0].sum() == v0[1].sum() > 0
    multi.reset_stream(1)
    v1 = np.asarray(multi.track_state.valid)
    assert v1[0].sum() > 0 and v1[1].sum() == 0
    # after reset, stream 1 behaves like a fresh first frame again
    lazy = multi.run([frames[2], frames[2]])
    r1 = MultiStreamDetector.fetch_stream(lazy, 1, cfg.out_thresh)
    # first frame after reset seeds new tracks with fresh ids
    assert all(d["age"] == 1 for d in r1)
