import numpy as np
import jax.numpy as jnp

from centertrack_tpu.ops.nms import nms_suppress, batched_nms


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([
        [0, 0, 10, 10],     # kept (highest score)
        [1, 1, 11, 11],     # IoU ~0.68 with first -> suppressed
        [20, 20, 30, 30],   # kept
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_suppress(boxes, scores, 0.5))
    assert keep.tolist() == [True, False, True]


def test_nms_chain_not_suppressed_by_suppressed():
    # b suppressed by a; c overlaps b but not a -> c kept
    boxes = jnp.asarray([
        [0, 0, 10, 10],
        [4, 0, 14, 10],
        [9, 0, 19, 10],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_suppress(boxes, scores, 0.35))
    assert keep.tolist() == [True, False, True]


def test_batched_per_class():
    boxes = jnp.asarray([[[0, 0, 10, 10], [1, 1, 11, 11]]], jnp.float32)
    scores = jnp.asarray([[0.9, 0.8]])
    same = np.asarray(batched_nms(boxes, scores,
                                  jnp.asarray([[0.0, 0.0]])))
    diff = np.asarray(batched_nms(boxes, scores,
                                  jnp.asarray([[0.0, 1.0]])))
    assert same[0].tolist() == [True, False]
    assert diff[0].tolist() == [True, True]
