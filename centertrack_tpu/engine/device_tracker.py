"""On-device greedy association tracker.

Re-expresses Tracker.step (reference: src/lib/utils/tracker.py:28-127)
as a jittable fixed-capacity state machine, so the association can fuse
into the per-frame device program and no detection tensors need to
reach the host between frames:

  * track state = capacity-T masked arrays (ids, centers, boxes, class,
    age, active) instead of a Python list of dicts;
  * the greedy row-by-row argmin (tracker.py:129-138) becomes a
    K-step lax.fori_loop with column masking — same tie-breaking order
    (detections are already score-sorted by decode);
  * births/deaths by masked cumsum compaction, preserving the
    reference's ret ordering (matches, then births, then aged tracks).

Private-detection mode only; public-det seeding stays on host
(engine/tracker.py) — it needs externally provided detections anyway.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class TrackState(NamedTuple):
    ids: jnp.ndarray        # (T,) int32
    cts: jnp.ndarray        # (T, 2) f32
    bboxes: jnp.ndarray     # (T, 4) f32
    classes: jnp.ndarray    # (T,) int32
    scores: jnp.ndarray     # (T,) f32
    ages: jnp.ndarray       # (T,) int32
    active: jnp.ndarray     # (T,) int32
    valid: jnp.ndarray      # (T,) bool
    id_count: jnp.ndarray   # () int32


def init_state(capacity: int) -> TrackState:
    t = capacity
    return TrackState(
        ids=jnp.zeros((t,), jnp.int32),
        cts=jnp.zeros((t, 2), jnp.float32),
        bboxes=jnp.zeros((t, 4), jnp.float32),
        classes=jnp.zeros((t,), jnp.int32),
        scores=jnp.zeros((t,), jnp.float32),
        ages=jnp.zeros((t,), jnp.int32),
        active=jnp.zeros((t,), jnp.int32),
        valid=jnp.zeros((t,), bool),
        id_count=jnp.zeros((), jnp.int32),
    )


def greedy_assign(dist: jnp.ndarray) -> jnp.ndarray:
    """Row-ordered greedy argmin (reference: tracker.py:129-138).
    dist: (K, T) with invalid entries >= 1e18. Returns (K,) matched
    column per row, -1 if none."""
    k, t = dist.shape

    def body(i, carry):
        dist, match = carry
        j = jnp.argmin(dist[i])
        ok = dist[i, j] < 1e16
        match = match.at[i].set(jnp.where(ok, j, -1))
        dist = jnp.where(
            ok, dist.at[:, j].set(1e18), dist)
        return dist, match

    _, match = jax.lax.fori_loop(
        0, k, body, (dist, jnp.full((k,), -1, jnp.int32)))
    return match


def step(state: TrackState, det_scores: jnp.ndarray,
         det_classes: jnp.ndarray, det_cts: jnp.ndarray,
         det_tracking: jnp.ndarray, det_bboxes: jnp.ndarray,
         out_thresh: float, new_thresh: float, max_age: int
         ) -> Tuple[TrackState, Dict[str, jnp.ndarray]]:
    """One association step. Det arrays are (K, ...) score-sorted.

    Returns (new_state, per-det dict with tracking_id / age / active;
    tracking_id == 0 means the detection produced no track).
    """
    k = det_scores.shape[0]
    t = state.ids.shape[0]
    det_valid = det_scores > out_thresh

    moved = det_cts + det_tracking                                  # K,2
    diff = moved[:, None, :] - state.cts[None, :, :]
    dist = (diff ** 2).sum(-1)                                      # K,T
    track_size = ((state.bboxes[:, 2] - state.bboxes[:, 0]) *
                  (state.bboxes[:, 3] - state.bboxes[:, 1]))
    det_size = ((det_bboxes[:, 2] - det_bboxes[:, 0]) *
                (det_bboxes[:, 3] - det_bboxes[:, 1]))
    invalid = ((dist > track_size[None, :]) |
               (dist > det_size[:, None]) |
               (det_classes[:, None] != state.classes[None, :]) |
               (~det_valid[:, None]) | (~state.valid[None, :]))
    dist = jnp.where(invalid, 1e18, dist)

    match = greedy_assign(dist)                                     # K
    matched = match >= 0
    mcol = jnp.maximum(match, 0)

    det_ids = jnp.where(matched, state.ids[mcol], 0)
    det_active = jnp.where(matched, state.active[mcol] + 1, 1)

    # births (reference: tracker.py:102-111)
    births = (~matched) & det_valid & (det_scores > new_thresh)
    birth_ord = jnp.cumsum(births.astype(jnp.int32))
    det_ids = jnp.where(births, state.id_count + birth_ord, det_ids)
    id_count = state.id_count + birth_ord[-1]

    has_track = matched | births
    det_age = jnp.where(has_track, 1, 0)
    det_active = jnp.where(has_track, det_active, 0)

    # aged unmatched tracks (reference: tracker.py:113-125)
    track_matched = jnp.zeros((t,), bool).at[mcol].set(
        jnp.ones((k,), bool) & matched, mode="drop")
    aged = state.valid & (~track_matched) & (state.ages < max_age)

    # compact new state: matched+birth dets first (det order), then aged
    # tracks. All fields are packed into ONE (n, 12) matrix so the
    # compaction is 2 scatters instead of 16 (scatter chains dominated
    # the step cost on TPU otherwise).
    det_keep = has_track
    det_pos = jnp.cumsum(det_keep.astype(jnp.int32)) - 1
    n_dets = det_keep.sum()
    aged_pos = n_dets + jnp.cumsum(aged.astype(jnp.int32)) - 1

    f32 = jnp.float32
    det_rows = jnp.concatenate([
        det_ids[:, None].astype(f32), det_cts, det_bboxes,
        det_classes[:, None].astype(f32), det_scores[:, None],
        det_age[:, None].astype(f32), det_active[:, None].astype(f32),
        det_keep[:, None].astype(f32)], axis=1)                 # K,12
    aged_rows = jnp.concatenate([
        state.ids[:, None].astype(f32), state.cts, state.bboxes,
        state.classes[:, None].astype(f32), state.scores[:, None],
        (state.ages + 1)[:, None].astype(f32),
        jnp.zeros((t, 1), f32),
        aged[:, None].astype(f32)], axis=1)                     # T,12

    packed = jnp.zeros((t, 12), f32)
    packed = packed.at[jnp.where(det_keep, det_pos, t)].set(
        det_rows, mode="drop")
    packed = packed.at[jnp.where(aged, aged_pos, t)].set(
        aged_rows, mode="drop")

    new = TrackState(
        ids=packed[:, 0].astype(jnp.int32),
        cts=packed[:, 1:3],
        bboxes=packed[:, 3:7],
        classes=packed[:, 7].astype(jnp.int32),
        scores=packed[:, 8],
        ages=packed[:, 9].astype(jnp.int32),
        active=packed[:, 10].astype(jnp.int32),
        valid=packed[:, 11] > 0.5,
        id_count=id_count,
    )
    out = {"tracking_id": det_ids * has_track.astype(jnp.int32),
           "age": det_age, "active": det_active}
    return new, out


def init_from_dets(capacity: int, det_scores, det_classes, det_cts,
                   det_bboxes, new_thresh: float) -> TrackState:
    """Seed tracks from first-frame detections
    (reference: tracker.py:11-22)."""
    state = init_state(capacity)
    keep = det_scores > new_thresh
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    t = capacity

    def scatter(init, src):
        p = jnp.where(keep, pos, t)
        return init.at[p].set(src, mode="drop")

    n = keep.sum()
    return TrackState(
        ids=scatter(state.ids, pos + 1),
        cts=scatter(state.cts, det_cts),
        bboxes=scatter(state.bboxes, det_bboxes),
        classes=scatter(state.classes, det_classes),
        scores=scatter(state.scores, det_scores),
        ages=scatter(state.ages, jnp.ones_like(det_classes)),
        active=scatter(state.active, jnp.ones_like(det_classes)),
        valid=scatter(state.valid, keep),
        id_count=n.astype(jnp.int32),
    )
