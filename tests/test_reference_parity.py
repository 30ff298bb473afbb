"""Detection parity vs the PyTorch reference implementation.

BASELINE.md's target includes "detections matching the PyTorch reference
within tolerance". These tests run the ACTUAL reference decode + greedy-NMS
code (imported read-only from /root/reference, torch CPU) against this
repo's TPU-native decode (`decode_predictions`) and fixed-shape NMS
(`nms_fixed`) on identical inputs:

  * decoder parity: same raw predictions -> same boxes/scores/classes
    (reference: src/models/yolo_head.py:206-294);
  * NMS parity: same candidate set -> identical kept set
    (reference greedy loop: src/models/yolo_head.py:678-731).

Skipped automatically when the reference checkout or torch is unavailable.
"""

import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
sys.path.insert(0, REFERENCE)
try:
    from src.models.yolo_head import YOLOAnchorGenerator, YOLODecoder, YOLODetectionHead
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference not importable: {e}", allow_module_level=True)

import jax.numpy as jnp

from hvs_tpu.models.yolo_head import (
    COCO_ANCHORS_416,
    decode_predictions,
    make_anchor_grid,
)
from hvs_tpu.ops.nms import nms_fixed


@pytest.mark.parametrize("scale_idx,grid", [(0, 52), (1, 26), (2, 13)])
def test_decoder_parity_with_reference(scale_idx, grid):
    """Identical raw head outputs must decode to identical boxes/scores."""
    rng = np.random.default_rng(scale_idx)
    b, a, c = 2, 3, 8
    # Moderate logit range keeps the repo's wh clip (+-4) inert, matching the
    # reference's unclamped exp.
    raw = rng.uniform(-3, 3, (b, grid, grid, a, 5 + c)).astype(np.float32)

    # Reference path: [B, A, H, W, 5+C] layout. The reference's own
    # YOLOAnchorGenerator crashes on its defaults (torch.stack over unequal
    # grid sizes, yolo_head.py:74 — evidence it never ran); build the
    # [A, H, W, 4] anchor tensor to its documented semantics instead
    # (centers (g+0.5)/grid, wh = COCO pixels / 416, yolo_head.py:47-66).
    ref_dec = YOLODecoder(image_size=416)
    coco_px = [
        [(10, 13), (16, 30), (33, 23)],
        [(30, 61), (62, 45), (59, 119)],
        [(116, 90), (156, 198), (373, 326)],
    ][scale_idx]
    gy, gx = torch.meshgrid(
        torch.arange(grid), torch.arange(grid), indexing="ij"
    )
    ref_anchors = torch.stack(
        [
            torch.stack(
                [
                    (gx + 0.5) / grid,
                    (gy + 0.5) / grid,
                    torch.full_like(gx, w_px / 416.0, dtype=torch.float32),
                    torch.full_like(gy, h_px / 416.0, dtype=torch.float32),
                ],
                dim=-1,
            )
            for (w_px, h_px) in coco_px
        ]
    ).float()
    ref_out = ref_dec(
        torch.from_numpy(np.transpose(raw, (0, 3, 1, 2, 4))),
        ref_anchors,
        (grid, grid),
    )
    ref_boxes = ref_out["boxes"].numpy()
    # Reference decoder broadcast bug (yolo_head.py:251-263): the grids are
    # viewed (1,1,H,W) and added to [B,A,H,W,1] predictions, yielding
    # [B,A,H,W,W,4]. On the k=w diagonal the x grid index is coincidentally
    # right, but the y grid index degenerates to w — the row index is LOST.
    # Parity is asserted against the decoder's documented intent
    # ("y = (grid_y + sigmoid(ty)) / grid_h", yolo_head.py:256-259):
    # take the diagonal and restore the y grid term h - w.
    if ref_boxes.ndim == 6:
        ii = np.arange(grid)
        ref_boxes = ref_boxes[:, :, :, ii, ii, :].copy()
        h_idx = np.arange(grid, dtype=np.float32)[None, None, :, None]
        w_idx = np.arange(grid, dtype=np.float32)[None, None, None, :]
        fix = (h_idx - w_idx) / grid
        ref_boxes[..., 1] += fix
        ref_boxes[..., 3] += fix
    ref_scores = ref_out["scores"].numpy()
    ref_cls = ref_out["class_indices"].numpy()

    # TPU-native path: [B, H, W, A, 5+C] layout.
    anchor_grid = jnp.asarray(make_anchor_grid(grid, grid, COCO_ANCHORS_416[scale_idx]))
    out = decode_predictions(jnp.asarray(raw), anchor_grid)
    boxes = np.transpose(np.asarray(out["boxes"]), (0, 3, 1, 2, 4))
    scores = np.transpose(np.asarray(out["scores"]), (0, 3, 1, 2, 4))
    cls_idx = np.transpose(np.asarray(out["class_indices"]), (0, 3, 1, 2))

    np.testing.assert_allclose(boxes, ref_boxes, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(cls_idx, ref_cls)
    # Serve-path score shortcut must agree with the full product's max.
    np.testing.assert_allclose(
        np.asarray(out["class_scores"]),
        np.transpose(ref_out["class_scores"].numpy(), (0, 2, 3, 1)),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_nms_parity_with_reference(seed):
    """The fixed-point on-device NMS keeps exactly the reference greedy set."""
    rng = np.random.default_rng(seed)
    n = 200
    cx = rng.uniform(0.1, 0.9, n)
    cy = rng.uniform(0.1, 0.9, n)
    w = rng.uniform(0.05, 0.3, n)
    h = rng.uniform(0.05, 0.3, n)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1).astype(
        np.float32
    )
    scores = rng.uniform(0.3, 1.0, n).astype(np.float32)

    head = YOLODetectionHead.__new__(YOLODetectionHead)  # only need the method
    keep = head.non_max_suppression(
        torch.from_numpy(boxes), torch.from_numpy(scores),
        iou_threshold=0.5, max_detections=100,
    ).numpy()
    ref_kept = {tuple(np.round(boxes[i], 5)) for i in keep}

    res = nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.zeros((n,), jnp.int32),  # single class: class-aware == plain
        iou_threshold=0.5, score_threshold=0.0, max_detections=100,
        pre_nms_top_k=256,
    )
    nv = int(res.num_valid)
    got_kept = {tuple(np.round(np.asarray(res.boxes)[i], 5)) for i in range(nv)}

    assert got_kept == ref_kept
    # Scores of kept boxes must come out sorted descending, like the reference.
    kept_scores = np.asarray(res.scores)[:nv]
    assert (np.diff(kept_scores) <= 1e-6).all()
