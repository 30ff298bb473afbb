"""Tests for box geometry and on-device fixed-shape NMS."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvs_tpu.ops import (
    box_area,
    box_ciou,
    box_giou,
    box_iou,
    batched_nms,
    cxcywh_to_xyxy,
    matrix_nms,
    nms_fixed,
    pairwise_iou,
    soft_nms_fixed,
    xyxy_to_cxcywh,
)


def test_box_conversions_roundtrip():
    boxes = jnp.array([[10.0, 20.0, 50.0, 80.0], [0.0, 0.0, 1.0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(cxcywh_to_xyxy(xyxy_to_cxcywh(boxes))), np.asarray(boxes), atol=1e-5
    )


def test_iou_known_values():
    a = jnp.array([0.0, 0.0, 10.0, 10.0])
    b = jnp.array([5.0, 5.0, 15.0, 15.0])
    assert abs(float(box_iou(a, b)) - 25.0 / 175.0) < 1e-5
    assert abs(float(box_iou(a, a)) - 1.0) < 1e-5
    assert float(box_iou(a, jnp.array([20.0, 20.0, 30.0, 30.0]))) == 0.0
    assert float(box_area(a)) == 100.0


def test_pairwise_iou_shape():
    a = jnp.zeros((5, 4))
    b = jnp.zeros((7, 4))
    assert pairwise_iou(a, b).shape == (5, 7)


def test_giou_ciou_bounds():
    a = jnp.array([0.0, 0.0, 10.0, 10.0])
    b = jnp.array([20.0, 20.0, 30.0, 30.0])
    assert float(box_giou(a, b)) < 0  # disjoint boxes have negative GIoU
    assert abs(float(box_ciou(a, a)) - 1.0) < 1e-5
    g = jax.grad(lambda x: box_ciou(x, b))(a)
    assert bool(jnp.all(jnp.isfinite(g)))


def _toy_detections():
    # Three overlapping boxes of class 0 and one distant box of class 1.
    boxes = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],
            [1.0, 1.0, 11.0, 11.0],  # iou with box0 ≈ 0.68 — suppressed
            [8.0, 8.0, 18.0, 18.0],  # iou with box0 ≈ 0.02 — kept
            [50.0, 50.0, 60.0, 60.0],
        ]
    )
    scores = jnp.array([0.9, 0.8, 0.7, 0.6])
    classes = jnp.array([0, 0, 0, 1], dtype=jnp.int32)
    return boxes, scores, classes


def test_greedy_nms_matches_reference_semantics():
    boxes, scores, classes = _toy_detections()
    r = nms_fixed(boxes, scores, classes, iou_threshold=0.5, score_threshold=0.1, max_detections=10)
    assert int(r.num_valid) == 3
    kept_scores = np.asarray(r.scores[: int(r.num_valid)])
    np.testing.assert_allclose(kept_scores, [0.9, 0.7, 0.6], atol=1e-6)


def test_class_aware_nms_keeps_cross_class_overlap():
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]])
    scores = jnp.array([0.9, 0.8])
    classes = jnp.array([0, 1], dtype=jnp.int32)
    r = nms_fixed(boxes, scores, classes, iou_threshold=0.5, score_threshold=0.1, max_detections=4)
    assert int(r.num_valid) == 2
    r2 = nms_fixed(
        boxes, scores, classes, iou_threshold=0.5, score_threshold=0.1, max_detections=4,
        class_aware=False,
    )
    assert int(r2.num_valid) == 1


def test_nms_score_threshold():
    boxes, scores, classes = _toy_detections()
    r = nms_fixed(boxes, scores, classes, iou_threshold=0.5, score_threshold=0.75, max_detections=4)
    assert int(r.num_valid) == 1  # only the 0.9 and 0.8 pass, 0.8 gets suppressed


def test_nms_static_shape_and_jit():
    boxes, scores, classes = _toy_detections()
    f = jax.jit(
        lambda b, s, c: nms_fixed(b, s, c, iou_threshold=0.5, score_threshold=0.1, max_detections=8)
    )
    r = f(boxes, scores, classes)
    assert r.boxes.shape == (8, 4)
    assert r.scores.shape == (8,)
    assert bool(jnp.all(r.scores[int(r.num_valid):] == -1.0))


@pytest.mark.parametrize("method", ["soft", "matrix"])
def test_soft_variants_keep_strongest(method):
    boxes, scores, classes = _toy_detections()
    fn = soft_nms_fixed if method == "soft" else matrix_nms
    r = fn(boxes, scores, classes, score_threshold=0.1, max_detections=8)
    assert int(r.num_valid) >= 3
    assert abs(float(r.scores[0]) - 0.9) < 1e-5  # top box undecayed


def test_batched_nms():
    boxes, scores, classes = _toy_detections()
    bb = jnp.stack([boxes, boxes])
    ss = jnp.stack([scores, scores * 0.5])
    cc = jnp.stack([classes, classes])
    r = batched_nms(bb, ss, cc, method="hard", iou_threshold=0.5, score_threshold=0.1,
                    max_detections=6)
    assert r.boxes.shape == (2, 6, 4)
    assert int(r.num_valid[0]) == 3


def test_nms_empty_input():
    boxes = jnp.zeros((16, 4))
    scores = jnp.zeros((16,))
    classes = jnp.zeros((16,), jnp.int32)
    r = nms_fixed(boxes, scores, classes, score_threshold=0.25, max_detections=4)
    assert int(r.num_valid) == 0
