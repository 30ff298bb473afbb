"""Detection losses: static-shape YOLO target assignment, CIoU/focal/BCE, and
manifold regularization.

TPU-native redesign of the reference loss stack
(reference: src/training/loss_functions.py:30-586):

  * Target assignment is fully vectorized with ``scatter(mode='drop')`` —
    padded ground-truth slots carry out-of-bounds indices and are dropped by the
    scatter, so there are no data-dependent shapes anywhere.
  * :func:`mhc_yolo_loss` — per-scale CIoU box loss (reference :213-283), focal
    objectness (:285-307), BCE class loss with label smoothing (:192-204),
    lambda weights coord 5.0 / obj 1.0 / noobj 0.5 / cls 1.0 (:30-48).
  * :func:`multi_task_loss` — detection + classification + segmentation
    weighting (reference :309-489).
  * :func:`manifold_regularization_loss` — doubly-stochastic / spectral /
    smoothness penalties on every ``H_res_raw`` in the param tree (reference
    :491-586 and the trainer's per-step walk mhc_trainer.py:299-340) — computed
    inside the jitted step, with a power-iteration spectral bound instead of a
    full eigendecomposition.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.yolo_head import COCO_ANCHORS_416, SCALE_ORDER, effective_anchors
from ..ops.boxes import box_ciou, cxcywh_to_xyxy


class LossWeights(NamedTuple):
    """Lambda weights (reference: src/training/loss_functions.py:30-48)."""

    coord: float = 5.0
    obj: float = 1.0
    noobj: float = 0.5
    cls: float = 1.0


def build_targets(
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    gt_mask: jax.Array,
    grid_sizes: Sequence[Tuple[int, int]],
    num_classes: int,
    anchors=COCO_ANCHORS_416,
) -> Dict[str, Dict[str, jax.Array]]:
    """Assign padded ground truth to anchor cells, YOLOv3-style, statically.

    Each gt box is matched to its best of the 9 anchors by wh-IoU; the anchor
    determines the scale; the box center determines the cell. Padded gt slots
    (mask 0) scatter with out-of-bounds indices and are silently dropped.

    Args:
        gt_boxes: [B, M, 4] normalized cxcywh ground truth (padded).
        gt_labels: [B, M] int class ids.
        gt_mask: [B, M] 1.0 for real boxes.
        grid_sizes: [(H, W)] per scale, fine-to-coarse (matching SCALE_ORDER).

    Returns:
        Per scale: {"box": [B,H,W,A,4] cxcywh, "obj": [B,H,W,A], "cls": [B,H,W,A]}
    """
    b, m, _ = gt_boxes.shape
    num_scales = len(grid_sizes)
    a_per_scale = len(anchors[0])
    # Resolution-fixed anchor pixel sizes (see yolo_head.effective_anchors):
    # assignment must use the same effective anchors the decoder will.
    flat_anchors = jnp.asarray(
        np.array(
            [
                wh
                for s in range(num_scales)
                for wh in effective_anchors(s, grid_sizes[s][0], anchors)
            ],
            np.float32,
        )
    )  # [S*A, 2]

    # Best anchor per gt by IoU of width/height boxes centered at origin.
    gw = gt_boxes[..., 2:3]  # [B, M, 1]
    gh = gt_boxes[..., 3:4]
    aw = flat_anchors[None, None, :, 0]
    ah = flat_anchors[None, None, :, 1]
    inter = jnp.minimum(gw, aw) * jnp.minimum(gh, ah)
    union = gw * gh + aw * ah - inter
    wh_iou = inter / (union + 1e-9)  # [B, M, S*A]
    best = jnp.argmax(wh_iou, axis=-1)  # [B, M]
    best_scale = best // a_per_scale
    best_anchor = best % a_per_scale

    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, m))
    targets = {}
    for s, (gh_s, gw_s) in enumerate(grid_sizes):
        on_scale = (best_scale == s) & (gt_mask > 0.5)
        cx = gt_boxes[..., 0] * gw_s
        cy = gt_boxes[..., 1] * gh_s
        gx = jnp.clip(jnp.floor(cx), 0, gw_s - 1).astype(jnp.int32)
        gy = jnp.clip(jnp.floor(cy), 0, gh_s - 1).astype(jnp.int32)
        # Out-of-bounds index for non-assigned slots -> scatter drops them.
        drop = jnp.where(on_scale, 0, gw_s * gh_s * 4)
        gx_s = gx + drop
        ai = best_anchor

        box_t = jnp.zeros((b, gh_s, gw_s, a_per_scale, 4), jnp.float32)
        obj_t = jnp.zeros((b, gh_s, gw_s, a_per_scale), jnp.float32)
        cls_t = jnp.zeros((b, gh_s, gw_s, a_per_scale), jnp.int32)

        box_t = box_t.at[batch_idx, gy, gx_s, ai].set(gt_boxes, mode="drop")
        obj_t = obj_t.at[batch_idx, gy, gx_s, ai].set(1.0, mode="drop")
        cls_t = cls_t.at[batch_idx, gy, gx_s, ai].set(gt_labels, mode="drop")
        targets[SCALE_ORDER[s]] = {"box": box_t, "obj": obj_t, "cls": cls_t}
    return targets


def focal_bce(
    logits: jax.Array, targets: jax.Array, gamma: float = 2.0, alpha: float = 0.25
) -> jax.Array:
    """Focal binary cross-entropy on logits
    (reference: src/training/loss_functions.py:285-307)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    return alpha_t * ((1 - p_t) ** gamma) * ce


def bce_with_smoothing(
    logits: jax.Array, onehot: jax.Array, smoothing: float = 0.05
) -> jax.Array:
    """BCE with label smoothing (reference: loss_functions.py:192-204)."""
    t = onehot * (1 - smoothing) + 0.5 * smoothing
    return jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def mhc_yolo_loss(
    raw_outputs: Dict[str, jax.Array],
    targets: Dict[str, Dict[str, jax.Array]],
    num_classes: int,
    weights: LossWeights = LossWeights(),
    label_smoothing: float = 0.05,
    ignore_iou: float = 0.5,
    cls_mode: str = "bce",
    cls_pos_weight: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Full YOLO loss over all scales (reference: MHCYOLOLoss,
    src/training/loss_functions.py:67-307). Everything masked, no gathers with
    dynamic shapes.

    Args:
        raw_outputs: per-scale raw head outputs [B, H, W, A, 5+C] (bf16 ok).
        targets: from :func:`build_targets`.
        cls_mode: ``"bce"`` = the reference's independent per-class logistic
            loss (multi-label COCO convention, loss_functions.py:192-204);
            ``"softmax"`` = smoothed softmax cross-entropy. At 80 classes the
            plain BCE gradient is too sparse to converge in a 50k-step
            schedule: each class column of the predict conv sees ~1 positive
            per step against 79 per-positive negative pushes, and the r5b run
            left class argmax accuracy at 0.000 after 50k steps (probe in
            ACCURACY_r05 commit). Both alternatives below fix the within-cell
            1:(C-1) imbalance.
        cls_pos_weight: in ``bce`` mode, multiplies the true-class (target=1)
            term — ``num_classes - 1`` makes the positive pull balance the
            summed negative pushes per cell (BCEWithLogits pos_weight
            convention). 1.0 = reference behavior.
    """
    total_box = 0.0
    total_obj = 0.0
    total_cls = 0.0
    n_pos_total = 0.0
    for key in SCALE_ORDER:
        raw = raw_outputs[key].astype(jnp.float32)
        t = targets[key]
        bsz, h, w, a, _ = raw.shape
        obj_mask = t["obj"]  # [B,H,W,A]
        n_pos = jnp.sum(obj_mask)

        # --- Box loss: CIoU between decoded prediction and gt at positive cells.
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None, :, :, None]
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None, :, :, None]
        # anchors for this scale from targets' box widths are not stored; use
        # predicted decode consistent with yolo_head.decode_predictions.
        scale_idx = SCALE_ORDER.index(key)
        anc = jnp.asarray(
            np.array(effective_anchors(scale_idx, h), np.float32)
        )  # [A, 2] resolution-fixed pixel sizes, matching the decoder
        px = (gx + jax.nn.sigmoid(raw[..., 0])) / w
        py = (gy + jax.nn.sigmoid(raw[..., 1])) / h
        pw = anc[None, None, None, :, 0] * jnp.exp(jnp.clip(raw[..., 2], -4, 4))
        ph = anc[None, None, None, :, 1] * jnp.exp(jnp.clip(raw[..., 3], -4, 4))
        pred_xyxy = cxcywh_to_xyxy(jnp.stack([px, py, pw, ph], axis=-1))
        gt_xyxy = cxcywh_to_xyxy(t["box"])
        ciou = box_ciou(pred_xyxy, gt_xyxy)
        box_loss = jnp.sum((1.0 - ciou) * obj_mask) / jnp.maximum(n_pos, 1.0)

        # --- Objectness: focal BCE, noobj cells down-weighted; cells whose
        # prediction overlaps a gt well are ignored (standard YOLO ignore rule).
        # RetinaNet normalization (divide the summed focal loss by the positive
        # count, not the cell count): dividing by B*H*W*A diluted the positive
        # objectness signal ~5 orders of magnitude at 640^2 (201k cells vs ~60
        # positives), which the 8-class runs masked but the 80-class run
        # exposed — 50k steps left obj_loss pinned at 2e-3 and the serve model
        # scoring every cell at the sigmoid floor. Focal's (1-p_t)^2 keeps the
        # 200k-cell negative sum bounded (~1.0 at the -4.0 bias init), so the
        # per-positive scale matches the box and class terms.
        obj_logit = raw[..., 4]
        obj_loss_map = focal_bce(obj_logit, obj_mask)
        noobj_mask = (1.0 - obj_mask) * jnp.where(ciou > ignore_iou, 0.0, 1.0)
        obj_loss = (
            weights.obj * jnp.sum(obj_loss_map * obj_mask)
            + weights.noobj * jnp.sum(obj_loss_map * noobj_mask)
        ) / jnp.maximum(n_pos, 1.0)

        # --- Class loss at positive cells.
        onehot = jax.nn.one_hot(t["cls"], num_classes)
        if cls_mode == "softmax":
            tgt = onehot * (1.0 - label_smoothing) + label_smoothing / num_classes
            logp = jax.nn.log_softmax(raw[..., 5:], axis=-1)
            ce = -jnp.sum(tgt * logp, axis=-1)
            cls_loss = jnp.sum(ce * obj_mask) / jnp.maximum(n_pos, 1.0)
        else:
            cls_loss_map = bce_with_smoothing(raw[..., 5:], onehot, label_smoothing)
            if cls_pos_weight != 1.0:
                cls_loss_map = cls_loss_map * (
                    1.0 + (cls_pos_weight - 1.0) * onehot
                )
            cls_loss = jnp.sum(
                jnp.sum(cls_loss_map, -1) * obj_mask
            ) / jnp.maximum(n_pos, 1.0)

        total_box = total_box + box_loss
        total_obj = total_obj + obj_loss
        total_cls = total_cls + cls_loss
        n_pos_total = n_pos_total + n_pos

    loss = weights.coord * total_box + total_obj + weights.cls * total_cls
    metrics = {
        "box_loss": total_box,
        "obj_loss": total_obj,
        "cls_loss": total_cls,
        "num_positives": n_pos_total,
    }
    return loss, metrics


def _spectral_norm_bound(m: jax.Array, iters: int = 8) -> jax.Array:
    """Largest singular value via power iteration — the jit-friendly stand-in
    for the reference's per-step ``eigvalsh`` (mhc_trainer.py:299-340)."""
    v = jnp.ones((m.shape[-1],), jnp.float32) / np.sqrt(m.shape[-1])

    def body(_, v):
        u = m @ v
        u = u / (jnp.linalg.norm(u) + 1e-9)
        v = m.T @ u
        return v / (jnp.linalg.norm(v) + 1e-9)

    v = jax.lax.fori_loop(0, iters, body, v)
    return jnp.linalg.norm(m @ v)


def iter_h_res_leaves(params: Dict[str, Any]):
    """Yield every ``H_res_raw`` leaf in a param tree."""
    flat = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        if keys and keys[-1] == "H_res_raw":
            yield "/".join(keys), leaf


def manifold_regularization_loss(
    params: Dict[str, Any],
    ds_weight: float = 1.0,
    spectral_weight: float = 0.1,
    smooth_weight: float = 0.01,
    sk_iters: int = 20,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Soft manifold penalty over all mHC residual matrices, inside the step
    (reference: ManifoldRegularizationLoss loss_functions.py:491-586 + the
    trainer's Sinkhorn/eigvalsh walk mhc_trainer.py:299-340, amortized).

    Penalizes the TRUE finite-iteration Sinkhorn projection the forward pass
    uses — not a softmax proxy (reference re-projects the same way,
    mhc_trainer.py:299-340). ``sinkhorn_log`` makes row sums exact by
    construction, so the residual doubly-stochastic error after ``sk_iters``
    alternations lives entirely in the column sums; the penalty drives
    ``H_res_raw`` toward matrices whose projection converges within the
    iteration budget — which is exactly the ``ds_error`` the stability
    telemetry logs (models/layers.py monitor path). Spectral bound and raw
    smoothness terms follow the reference's ManifoldRegularizationLoss.
    """
    from ..ops.sinkhorn import sinkhorn_log

    ds_total = 0.0
    spec_total = 0.0
    smooth_total = 0.0
    count = 0
    for _, leaf in iter_h_res_leaves(params):
        proj = sinkhorn_log(leaf.astype(jnp.float32), n_iters=sk_iters)
        col = jnp.sum(proj, axis=-2)
        ds_total = ds_total + jnp.mean((col - 1.0) ** 2)
        spec = _spectral_norm_bound(proj)
        spec_total = spec_total + jax.nn.relu(spec - 1.0) ** 2
        dr = leaf[1:, :] - leaf[:-1, :]
        dc = leaf[:, 1:] - leaf[:, :-1]
        smooth_total = smooth_total + jnp.mean(dr**2) + jnp.mean(dc**2)
        count += 1
    count = max(count, 1)
    loss = (
        ds_weight * ds_total + spectral_weight * spec_total + smooth_weight * smooth_total
    ) / count
    metrics = {
        "manifold_ds": ds_total / count,
        "manifold_spectral": spec_total / count,
        "manifold_smooth": smooth_total / count,
    }
    return loss, metrics


def multi_task_loss(
    outputs: Dict[str, Any],
    batch: Dict[str, jax.Array],
    num_classes: int,
    task_weights: Dict[str, float] | None = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Weighted multi-task objective (reference: MultiTaskLoss,
    src/training/loss_functions.py:309-489)."""
    tw = {"detection": 1.0, "classification": 0.5, "segmentation": 0.5}
    if task_weights:
        tw.update(task_weights)
    total = 0.0
    metrics: Dict[str, jax.Array] = {}
    if "detection" in outputs and "targets" in batch:
        det_loss, det_m = mhc_yolo_loss(
            outputs["detection"]["raw"], batch["targets"], num_classes
        )
        total = total + tw["detection"] * det_loss
        metrics.update(det_m)
        metrics["detection_loss"] = det_loss
    if "classification" in outputs and "class_labels" in batch:
        logits = outputs["classification"].astype(jnp.float32)
        onehot = jax.nn.one_hot(batch["class_labels"], num_classes)
        cls = jnp.mean(
            -jnp.sum(onehot * jax.nn.log_softmax(logits, -1), axis=-1)
        )
        total = total + tw["classification"] * cls
        metrics["classification_loss"] = cls
    if "segmentation" in outputs and "seg_labels" in batch:
        logits = outputs["segmentation"].astype(jnp.float32)
        labels = batch["seg_labels"]
        if labels.shape[1] != logits.shape[1]:
            # Nearest-downsample dense labels to the head's output stride.
            fy = labels.shape[1] // logits.shape[1]
            labels = labels[:, ::fy, ::fy][:, : logits.shape[1], : logits.shape[2]]
        k = logits.shape[-1]
        log_p = jax.nn.log_softmax(logits, -1)
        ce_map = -jnp.take_along_axis(log_p, labels[..., None], axis=-1)[..., 0]
        # Class-balanced CE: plain mean-CE lets the background class (>90% of
        # pixels on detection-style scenes) dominate the gradient — the r3
        # multitask run left rare classes at IoU 0.008 (MULTITASK_r03.json).
        # Weight each pixel by the inverse in-batch frequency of its class
        # (clipped), normalized to a weighted mean.
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
        counts = jnp.sum(onehot, axis=(0, 1, 2))
        weights = jnp.where(
            counts > 0, labels.size / (k * jnp.maximum(counts, 1.0)), 0.0
        )
        weights = jnp.clip(weights, 0.05, 20.0)
        pix_w = weights[labels]
        seg = jnp.sum(ce_map * pix_w) / jnp.maximum(jnp.sum(pix_w), 1.0)
        # Soft-Dice over classes present in the batch: directly optimizes the
        # overlap the mIoU metric measures, immune to class imbalance.
        p = jnp.exp(log_p)
        inter = jnp.sum(p * onehot, axis=(0, 1, 2))
        denom = jnp.sum(p + onehot, axis=(0, 1, 2))
        present = (counts > 0).astype(jnp.float32)
        dice = 1.0 - jnp.sum(
            present * (2.0 * inter + 1.0) / (denom + 1.0)
        ) / jnp.maximum(jnp.sum(present), 1.0)
        seg = seg + 0.5 * dice
        total = total + tw["segmentation"] * seg
        metrics["segmentation_loss"] = seg
        metrics["segmentation_dice_loss"] = dice
    if "depth" in outputs and "depth" in batch:
        # L1 in log-depth (scale-robust; softplus head output is positive).
        pred = outputs["depth"].astype(jnp.float32)[..., 0]
        gt = batch["depth"].astype(jnp.float32)
        if gt.shape[1] != pred.shape[1]:
            fy = gt.shape[1] // pred.shape[1]
            gt = gt[:, ::fy, ::fy][:, : pred.shape[1], : pred.shape[2]]
        dep = jnp.mean(jnp.abs(jnp.log(pred + 1e-3) - jnp.log(gt + 1e-3)))
        total = total + tw.get("depth", 0.5) * dep
        metrics["depth_loss"] = dep
    metrics["total_loss"] = total
    return total, metrics
