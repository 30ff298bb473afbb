"""Target-assignment <-> decode consistency: the property that makes training
convergence produce correct detections.

Ground truth -> build_targets -> "perfect predictions" (targets inverted
through the decode equations) -> decode_predictions -> postprocess (NMS) ->
DetectionEvaluator must yield mAP@0.5 == 1.0. If the assignment and the decode
disagree on any convention (grid offset, anchor units, cxcywh order, scale
order), this loop breaks — and so would training (loss would optimize toward
boxes the decoder misreads). Reference chain: loss target prep
(src/training/loss_functions.py:213-283) vs decoder
(src/models/yolo_head.py:206-294).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hvs_tpu.models.yolo_head import (
    COCO_ANCHORS_416,
    SCALE_ORDER,
    decode_predictions,
    make_anchor_grid,
    postprocess_detections,
)
from hvs_tpu.training.losses import build_targets
from hvs_tpu.utils.metrics import DetectionEvaluator


def _logit(p):
    p = np.clip(p, 1e-6, 1 - 1e-6)
    return np.log(p / (1 - p))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_targets_invert_through_decoder_to_map_1(seed):
    rng = np.random.default_rng(seed)
    size = 128
    num_classes = 8
    b, m = 2, 6
    grids = [(size // 8, size // 8), (size // 16, size // 16), (size // 32, size // 32)]

    # Well-separated random gt (normalized cxcywh).
    boxes = np.zeros((b, m, 4), np.float32)
    mask = np.zeros((b, m), np.float32)
    labels = rng.integers(0, num_classes, (b, m)).astype(np.int32)
    for bi in range(b):
        n = int(rng.integers(2, m + 1))
        # Grid-separated centers avoid two gt landing in one anchor cell.
        cells = rng.choice(16, n, replace=False)
        cx = (cells % 4) * 0.25 + rng.uniform(0.08, 0.17, n)
        cy = (cells // 4) * 0.25 + rng.uniform(0.08, 0.17, n)
        w = rng.uniform(0.06, 0.2, n)
        h = rng.uniform(0.06, 0.2, n)
        boxes[bi, :n] = np.stack([cx, cy, w, h], 1)
        mask[bi, :n] = 1.0

    # jit the jnp-heavy stages: the three seeds share compiled programs
    # (same shapes), cutting ~8 s of eager dispatch per seed on this host.
    targets = jax.jit(functools.partial(
        build_targets, grid_sizes=grids, num_classes=num_classes))(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask)
    )

    # Invert the decode equations at every positive cell.
    outputs = {}
    for s, key in enumerate(SCALE_ORDER):
        gh, gw = grids[s]
        t_box = np.asarray(targets[key]["box"])  # [B,H,W,A,4] cxcywh
        t_obj = np.asarray(targets[key]["obj"])
        t_cls = np.asarray(targets[key]["cls"])
        a = t_obj.shape[3]
        raw = np.zeros((b, gh, gw, a, 5 + num_classes), np.float32)
        raw[..., 4] = -12.0  # objectness off everywhere
        anc = np.asarray(COCO_ANCHORS_416[s], np.float32)  # [A, 2] normalized wh
        ys, xs = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        for bi, gy, gx, ai in zip(*np.nonzero(t_obj)):
            cxn, cyn, wn, hn = t_box[bi, gy, gx, ai]
            raw[bi, gy, gx, ai, 0] = _logit(cxn * gw - gx)
            raw[bi, gy, gx, ai, 1] = _logit(cyn * gh - gy)
            raw[bi, gy, gx, ai, 2] = np.log(max(wn, 1e-6) / anc[ai, 0])
            raw[bi, gy, gx, ai, 3] = np.log(max(hn, 1e-6) / anc[ai, 1])
            raw[bi, gy, gx, ai, 4] = 12.0
            raw[bi, gy, gx, ai, 5 + t_cls[bi, gy, gx, ai]] = 12.0

        grid = jnp.asarray(make_anchor_grid(gh, gw, COCO_ANCHORS_416[s]))
        dec = jax.jit(decode_predictions)(jnp.asarray(raw), grid)
        outputs[key] = dec

    # Merge scales the way the head does: flatten and concat.
    merged = {
        "boxes": jnp.concatenate(
            [outputs[k]["boxes"].reshape(b, -1, 4) for k in SCALE_ORDER], axis=1
        ),
        "class_scores": jnp.concatenate(
            [outputs[k]["class_scores"].reshape(b, -1) for k in SCALE_ORDER], axis=1
        ),
        "class_indices": jnp.concatenate(
            [outputs[k]["class_indices"].reshape(b, -1) for k in SCALE_ORDER], axis=1
        ),
    }
    det = jax.jit(functools.partial(
        postprocess_detections, score_threshold=0.5, max_detections=32))(merged)

    ev = DetectionEvaluator(num_classes=num_classes)
    for bi in range(b):
        nv = int(det.num_valid[bi])
        pred_boxes = np.asarray(det.boxes[bi][:nv]) * size
        pred_scores = np.asarray(det.scores[bi][:nv])
        pred_cls = np.asarray(det.classes[bi][:nv])
        keep = mask[bi] > 0.5
        gt_cxcywh = boxes[bi][keep] * size
        gt_xyxy = np.stack(
            [
                gt_cxcywh[:, 0] - gt_cxcywh[:, 2] / 2,
                gt_cxcywh[:, 1] - gt_cxcywh[:, 3] / 2,
                gt_cxcywh[:, 0] + gt_cxcywh[:, 2] / 2,
                gt_cxcywh[:, 1] + gt_cxcywh[:, 3] / 2,
            ],
            1,
        )
        ev.add_image(pred_boxes, pred_scores, pred_cls, gt_xyxy, labels[bi][keep])

    res = ev.evaluate()
    assert res["mAP@0.5"] == pytest.approx(1.0), res
    # Boxes must round-trip near-exactly, not just above the IoU threshold.
    assert res["mAP@[.5:.95]"] == pytest.approx(1.0), res


@pytest.mark.parametrize("train_size,serve_size", [(416, 640), (416, 512), (416, 320)])
def test_decode_is_resolution_independent(train_size, serve_size):
    """A 416-trained model serves other resolutions without box inflation.

    A CNN measures object extent in pixels: the same object produces the same
    wh logits at any canvas size. With resolution-fixed anchor pixel sizes
    (effective_anchors), identical logits decoded at a different grid must
    give the same box extent in canvas pixels (and hence, after letterbox
    inversion, on the source image). Before the fix wh inflated by exactly
    serve_size/train_size — measured on the shapes benchmark as 0.94 mAP@0.5
    at 416 collapsing to 0.07 at 640.
    """
    from hvs_tpu.models.yolo_head import effective_anchors

    stride = 32  # coarse head; the property is per-scale identical
    t_wh = np.exp(np.array([0.3, -0.2], np.float32))  # learned wh multiplier
    for scale_idx, stride in enumerate((8, 16, 32)):
        anc_t = np.asarray(
            effective_anchors(scale_idx, train_size // stride), np.float32)
        anc_s = np.asarray(
            effective_anchors(scale_idx, serve_size // stride), np.float32)
        # normalized wh * canvas size = pixels on the canvas; must be equal.
        np.testing.assert_allclose(
            anc_t * t_wh * train_size, anc_s * t_wh * serve_size, rtol=1e-5)
