"""Device tracker must agree with the host reference tracker on random
private-mode scenarios (ids, actives, births, deaths)."""

import numpy as np
import jax
import jax.numpy as jnp

from centertrack_tpu.config import Config, parse_task
from centertrack_tpu.engine import device_tracker as dt
from centertrack_tpu.engine.tracker import Tracker


def make_cfg(max_age=3):
    return parse_task(Config(task="tracking", track_thresh=0.3,
                             new_thresh=0.3, max_age=max_age))


def random_dets(rng, k=8, n_real=4):
    scores = np.zeros(k, np.float32)
    scores[:n_real] = rng.uniform(0.4, 1.0, n_real)
    scores[:n_real] = -np.sort(-scores[:n_real])
    classes = rng.randint(1, 3, k).astype(np.int32)
    cts = rng.uniform(0, 100, (k, 2)).astype(np.float32)
    tracking = rng.uniform(-3, 3, (k, 2)).astype(np.float32)
    wh = rng.uniform(8, 20, (k, 2)).astype(np.float32)
    bboxes = np.concatenate([cts - wh / 2, cts + wh / 2], 1)
    return scores, classes, cts, tracking, bboxes


def to_host_dets(scores, classes, cts, tracking, bboxes, thresh):
    out = []
    for i in range(len(scores)):
        if scores[i] > thresh:
            out.append({"score": float(scores[i]),
                        "class": int(classes[i]),
                        "ct": cts[i].copy(), "tracking": tracking[i].copy(),
                        "bbox": bboxes[i].copy()})
    return out


def test_device_matches_host_over_sequence():
    cfg = make_cfg()
    rng = np.random.RandomState(0)
    host = Tracker(cfg)
    dev = dt.init_state(32)
    step = jax.jit(lambda s, *a: dt.step(
        s, *a, out_thresh=cfg.out_thresh, new_thresh=cfg.new_thresh,
        max_age=cfg.max_age))

    # frame 0: init
    scores, classes, cts, tracking, bboxes = random_dets(rng)
    host.init_track(to_host_dets(scores, classes, cts, tracking, bboxes,
                                 cfg.new_thresh))
    dev = dt.init_from_dets(32, jnp.asarray(scores), jnp.asarray(classes),
                            jnp.asarray(cts), jnp.asarray(bboxes),
                            cfg.new_thresh)
    assert int(dev.id_count) == host.id_count

    for frame in range(5):
        # drift existing objects slightly + random new dets
        scores, classes, cts, tracking, bboxes = random_dets(
            rng, n_real=rng.randint(2, 6))
        host_dets = to_host_dets(scores, classes, cts, tracking, bboxes,
                                 cfg.out_thresh)
        host_out = host.step([dict(d) for d in host_dets])
        dev, det_out = step(dev, jnp.asarray(scores), jnp.asarray(classes),
                            jnp.asarray(cts), jnp.asarray(tracking),
                            jnp.asarray(bboxes))
        # id assignment must agree det-by-det
        host_ids = {}
        for d in host_out:
            if d.get("age") == 1:  # current-frame det entries
                host_ids[tuple(np.round(d["ct"], 3))] = d["tracking_id"]
        dev_ids = np.asarray(det_out["tracking_id"])
        for i in range(len(scores)):
            key = tuple(np.round(cts[i], 3))
            if scores[i] > cfg.out_thresh and key in host_ids:
                assert dev_ids[i] == host_ids[key], (frame, i)
        assert int(dev.id_count) == host.id_count
        assert int(dev.valid.sum()) == len(host.tracks)


def test_device_track_aging():
    cfg = make_cfg(max_age=3)
    dev = dt.init_state(8)
    scores = jnp.asarray([0.9, 0.0], jnp.float32)
    classes = jnp.asarray([1, 1], jnp.int32)
    cts = jnp.asarray([[50.0, 50.0], [0, 0]], jnp.float32)
    bboxes = jnp.asarray([[45, 45, 55, 55], [0, 0, 0, 0]], jnp.float32)
    dev = dt.init_from_dets(8, scores, classes, cts, bboxes, 0.3)
    # empty frame -> track ages, stays valid with active=0
    zeros = jnp.zeros_like(scores)
    dev, out = dt.step(dev, zeros, classes, cts,
                       jnp.zeros_like(cts), bboxes,
                       out_thresh=0.3, new_thresh=0.3, max_age=3)
    assert int(dev.valid.sum()) == 1
    assert int(dev.active[0]) == 0
    assert int(dev.ages[0]) == 2
    # two more empty frames -> exceeds max_age, dies
    dev, _ = dt.step(dev, zeros, classes, cts, jnp.zeros_like(cts), bboxes,
                     out_thresh=0.3, new_thresh=0.3, max_age=3)
    dev, _ = dt.step(dev, zeros, classes, cts, jnp.zeros_like(cts), bboxes,
                     out_thresh=0.3, new_thresh=0.3, max_age=3)
    assert int(dev.valid.sum()) == 0
