import numpy as np

from centertrack_tpu.config import Config, parse_task
from centertrack_tpu.engine.tracker import Tracker, greedy_assignment


def make_cfg(**kw):
    kw.setdefault("max_age", -1)
    return parse_task(Config(task="tracking", **kw))


def det(ct, score=0.9, cls=1, tracking=(0.0, 0.0), wh=(10, 10)):
    return {"ct": list(ct), "score": score, "class": cls,
            "tracking": list(tracking),
            "bbox": [ct[0] - wh[0] / 2, ct[1] - wh[1] / 2,
                     ct[0] + wh[0] / 2, ct[1] + wh[1] / 2]}


def test_greedy_assignment_order():
    dist = np.array([[1.0, 5.0], [2.0, 3.0]])
    m = greedy_assignment(dist.copy())
    # row 0 takes col 0 first; row 1 must take col 1
    assert m.tolist() == [[0, 0], [1, 1]]


def test_init_and_step_keeps_id():
    cfg = make_cfg()
    tr = Tracker(cfg)
    tr.init_track([det((50, 50))])
    assert len(tr.tracks) == 1 and tr.tracks[0]["tracking_id"] == 1
    # next frame: object moved +5 in x; tracking points back -5
    out = tr.step([det((55, 50), tracking=(-5.0, 0.0))])
    assert len(out) == 1
    assert out[0]["tracking_id"] == 1
    assert out[0]["active"] == 2


def test_new_track_birth_and_death():
    cfg = make_cfg()
    tr = Tracker(cfg)
    tr.init_track([det((50, 50))])
    out = tr.step([det((55, 50), tracking=(-5.0, 0.0)), det((200, 200))])
    assert len(out) == 2
    ids = sorted(t["tracking_id"] for t in out)
    assert ids == [1, 2]
    # drop both dets: tracks die immediately with max_age=-1
    out = tr.step([])
    assert out == []


def test_max_age_keeps_inactive():
    cfg = make_cfg(max_age=3)
    tr = Tracker(cfg)
    tr.init_track([det((50, 50))])
    out = tr.step([])
    assert len(out) == 1 and out[0]["active"] == 0 and out[0]["age"] == 2


def test_class_mismatch_blocks_match():
    cfg = make_cfg()
    tr = Tracker(cfg)
    tr.init_track([det((50, 50), cls=1)])
    out = tr.step([det((50, 50), cls=2)])
    # same position, different class -> new id
    assert out[0]["tracking_id"] == 2


def test_distance_gate_by_size():
    cfg = make_cfg()
    tr = Tracker(cfg)
    tr.init_track([det((50, 50), wh=(4, 4))])
    # moved 10 px but box area is 16 -> dist 100 > 16 -> no match
    out = tr.step([det((60, 50), wh=(4, 4))])
    assert out[0]["tracking_id"] == 2


def test_hungarian_matches_greedy_simple():
    cfg = make_cfg(hungarian=True)
    tr = Tracker(cfg)
    tr.init_track([det((50, 50)), det((80, 50))])
    out = tr.step([det((50, 50)), det((80, 50))])
    ids = {tuple(t["ct"]): t["tracking_id"] for t in out}
    assert ids[(50, 50)] == 1 and ids[(80, 50)] == 2


def test_public_det_mode():
    cfg = make_cfg(public_det=True)
    tr = Tracker(cfg)
    tr.init_track([det((50, 50))])
    # one matched det + one unmatched; public det provided near unmatched
    out = tr.step(
        [det((50, 50)), det((200, 200))],
        public_det=[{"ct": [201, 201]}])
    assert len(out) == 2
    # unmatched far det gets a new id only because a public det seeds it
    tr2 = Tracker(cfg)
    tr2.init_track([det((50, 50))])
    out2 = tr2.step([det((50, 50)), det((200, 200))], public_det=[])
    assert len(out2) == 1
