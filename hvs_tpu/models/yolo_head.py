"""YOLO multi-scale detection head with fully on-device decode + NMS.

TPU-native redesign of the reference head (reference: src/models/yolo_head.py):

  * Anchor generation (:11-90) is a static numpy computation baked into the jit
    as constants — 3 anchors x 3 scales, COCO sizes normalized by 416.
  * Per-scale prediction heads (:93-203): reduce 1x1 -> 3x3 conv -> channel mHC
    -> 1x1 to A*(5+C), objectness bias initialized to -4.0.
  * Decode (:206-294): fully vectorized sigmoid-xy + grid, exp-wh x anchor,
    normalized xyxy output; no Python loops.
  * Post-process (:468-755): the reference's per-scale confidence filter +
    greedy Python NMS + cross-scale NMS collapses into ONE static-shape
    on-device NMS over the concatenated scales (hvs_tpu.ops.nms) — boxes never
    leave the device until final fixed-size results.

Anchor-scale pairing uses the standard YOLOv3 convention (fine stride-8 grid
gets the small anchors); the reference pairs them in the opposite order, which
is one of its never-ran bugs we do not cargo-cult.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import ManifoldHyperConnection, group_norm
from .backbone import QuantConv
from ..ops.nms import NMSResult, batched_nms
from ..ops.quant import calib_maxabs as _head_maxabs, quantize_tensor

Dtype = Any

# COCO anchor sizes in pixels at 416 input (reference: src/models/yolo_head.py:27-32),
# normalized to [0, 1] by 416 (reference :50-52). Ordered fine-to-coarse grid.
COCO_ANCHORS_416: Tuple[Tuple[Tuple[float, float], ...], ...] = (
    ((10 / 416, 13 / 416), (16 / 416, 30 / 416), (33 / 416, 23 / 416)),  # stride 8
    ((30 / 416, 61 / 416), (62 / 416, 45 / 416), (59 / 416, 119 / 416)),  # stride 16
    ((116 / 416, 90 / 416), (156 / 416, 198 / 416), (373 / 416, 326 / 416)),  # stride 32
)

SCALE_ORDER = ("fused_small", "fused_medium", "fused_large")

# Grid sizes per scale at the 416 reference input (strides 8/16/32). Anchors
# keep FIXED pixel sizes across input resolutions (the standard YOLO
# convention): at a grid of height h the effective normalized anchor is
# a * ref_grid / h, i.e. a * 416 / input_size. Without this, decoded box
# wh inflates by exactly input_size/416 when serving a 416-trained model at
# another resolution (a CNN measures object extent in pixels: an object
# spanning P pixels produces the same features — and the same wh logits —
# at any canvas size, so the anchor pixel size must not scale with canvas).
ANCHOR_REF_GRIDS: Tuple[int, int, int] = (52, 26, 13)


def effective_anchors(scale_idx: int, grid_h: int, anchors=COCO_ANCHORS_416):
    """Per-scale anchors rescaled so their pixel size is resolution-fixed.

    At 416 input (grid_h == ANCHOR_REF_GRIDS[scale_idx]) this is the identity,
    so 416-trained checkpoints and the 416 reference-parity semantics are
    unchanged.
    """
    f = ANCHOR_REF_GRIDS[scale_idx] / float(grid_h)
    return tuple((aw * f, ah * f) for aw, ah in anchors[scale_idx])


def make_anchor_grid(grid_h: int, grid_w: int, anchors) -> np.ndarray:
    """Static anchor tensor [A, H, W, 4] (cx, cy, w, h), normalized coords
    (reference: src/models/yolo_head.py:42-76)."""
    a = len(anchors)
    ys, xs = np.meshgrid(np.arange(grid_h), np.arange(grid_w), indexing="ij")
    out = np.zeros((a, grid_h, grid_w, 4), np.float32)
    for i, (w, h) in enumerate(anchors):
        out[i, ..., 0] = (xs + 0.5) / grid_w
        out[i, ..., 1] = (ys + 0.5) / grid_h
        out[i, ..., 2] = w
        out[i, ..., 3] = h
    return out


class YOLOPredictionHead(nn.Module):
    """Per-scale prediction tower (reference: src/models/yolo_head.py:93-203)."""

    num_classes: int = 80
    num_anchors: int = 3
    head_channels: int = 256
    sk_iters: int = 20
    use_mhc: bool = True
    dtype: Dtype = jnp.bfloat16
    monitor: bool = False
    precomputed_constraints: bool = False
    use_pallas: bool = False
    act_quant: bool = False
    quant_calib: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = x.astype(self.dtype)
        # int8 serving sites for the two tower convs (the head is 21% of the
        # HBM-bound serve program's bytes, artifacts/BYTES_r03.json); the
        # ``predict`` logits conv stays float — its output feeds the decode's
        # sigmoid/exp directly. Same scheme as ConvMHCBlock (backbone.py).
        if self.quant_calib:
            self.sow("quant_stats", "x_scale", _head_maxabs(x))
        if self.act_quant:
            ones = lambda: jnp.ones((), jnp.float32)  # noqa: E731
            x_scale = self.variable("quant", "x_scale", ones).value
            y1_scale = self.variable("quant", "y1_scale", ones).value
            y = QuantConv(self.head_channels, (1, 1), out_dtype=self.dtype,
                          name="reduce")(quantize_tensor(x, x_scale), x_scale)
        else:
            y = nn.Conv(self.head_channels, (1, 1), use_bias=False, dtype=self.dtype,
                        name="reduce")(x)
        y = group_norm(self.head_channels, self.dtype)(y)
        y = nn.silu(y)
        if self.quant_calib:
            self.sow("quant_stats", "y1_scale", _head_maxabs(y))
        if self.act_quant:
            y = QuantConv(self.head_channels, (3, 3), out_dtype=self.dtype,
                          name="conv")(quantize_tensor(y, y1_scale), y1_scale)
        else:
            y = nn.Conv(self.head_channels, (3, 3), use_bias=False, dtype=self.dtype,
                        name="conv")(y)
        y = group_norm(self.head_channels, self.dtype)(y)
        y = nn.silu(y)
        if self.use_mhc:
            y = ManifoldHyperConnection(
                dim=self.head_channels,
                expansion_rate=1,
                mlp_ratio=1,
                sk_iters=self.sk_iters,
                dtype=self.dtype,
                monitor=self.monitor,
                precomputed_constraints=self.precomputed_constraints,
                use_pallas=self.use_pallas,
                name="mhc",
            )(y, deterministic)
        per_anchor = 5 + self.num_classes

        # Objectness AND class biases -4.0 so early training predicts
        # background / the class prior (reference: src/models/yolo_head.py
        # objectness bias init; class prior init is the RetinaNet recipe).
        # Without the class part, the 80-way BCE starts at ~55/positive with
        # a ~1300 gradient norm, which poisons Adam's second moment for the
        # first ~1/(1-b2) steps and stalls classification learning.
        def bias_init(key, shape, dtype=jnp.float32):
            b = jnp.full(shape, -4.0, dtype)
            b = b.reshape(self.num_anchors, per_anchor)
            b = b.at[:, :4].set(0.0)
            return b.reshape(shape)

        out = nn.Conv(
            self.num_anchors * per_anchor, (1, 1), dtype=self.dtype,
            bias_init=bias_init, name="predict",
        )(y)
        b, h, w, _ = out.shape
        return out.reshape(b, h, w, self.num_anchors, per_anchor)


def decode_predictions(
    raw: jax.Array, anchors: jax.Array, wh_clip: float = 4.0
) -> Dict[str, jax.Array]:
    """Vectorized YOLO decode (reference: src/models/yolo_head.py:206-294).

    Args:
        raw: [B, H, W, A, 5+C] raw head output.
        anchors: [A, H, W, 4] anchor grid (cx, cy, w, h normalized).
        wh_clip: clamp on the wh logits before exp (numerical safety; the
            reference's bare ``exp`` overflows in fp16).

    Returns dict with normalized xyxy ``boxes`` [B, H, W, A, 4], per-class
    ``scores`` [B, H, W, A, C], ``objectness``, ``class_scores``, ``class_indices``.
    """
    box_raw = raw[..., :5].astype(jnp.float32)
    b, h, w, a, _ = raw.shape
    xy = jax.nn.sigmoid(box_raw[..., 0:2])
    wh = jnp.exp(jnp.clip(box_raw[..., 2:4], -wh_clip, wh_clip))
    obj = jax.nn.sigmoid(box_raw[..., 4:5])

    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]  # [1, H, W, 1, 2]
    # anchors: [A, H, W, 4] -> [1, H, W, A, 4]
    anc = jnp.transpose(anchors, (1, 2, 0, 3))[None]
    center = (grid + xy) / jnp.array([w, h], jnp.float32)
    size = anc[..., 2:4] * wh
    half = size / 2
    boxes = jnp.concatenate([center - half, center + half], axis=-1)

    # Class confidence without materializing the fp32 [.., C] sigmoid product:
    # sigmoid is monotone, so argmax(sigmoid(x)) == argmax(x) and
    # max(sigmoid(x)) == sigmoid(max(x)) — the reductions run on the raw
    # (bf16) logits and only per-anchor scalars hit fp32. The full per-class
    # ``scores`` tensor is still provided for losses/API parity; XLA dead-code
    # eliminates it on the serve path, which only consumes class_scores/indices.
    cls_logits = raw[..., 5:]
    max_logit = jnp.max(cls_logits, axis=-1).astype(jnp.float32)
    class_scores = obj[..., 0] * jax.nn.sigmoid(max_logit)
    class_indices = jnp.argmax(cls_logits, axis=-1)
    scores = obj * jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    return {
        "boxes": boxes,
        "scores": scores,
        "objectness": obj,
        "class_scores": class_scores,
        "class_indices": class_indices,
    }


class YOLODetectionHead(nn.Module):
    """Multi-scale head: prediction towers + decode + single-pass on-device NMS
    (reference: src/models/yolo_head.py:468-755; the reference's per-scale NMS
    then cross-scale NMS is replaced by one global class-aware NMS over all
    scales — same suppression semantics, one kernel)."""

    num_classes: int = 80
    num_anchors: int = 3
    head_channels: int = 256
    sk_iters: int = 20
    use_mhc: bool = True
    anchors: Tuple = COCO_ANCHORS_416
    dtype: Dtype = jnp.bfloat16
    monitor: bool = False
    precomputed_constraints: bool = False
    use_pallas: bool = False
    act_quant: bool = False
    quant_calib: bool = False

    @nn.compact
    def __call__(
        self, features: Dict[str, jax.Array], deterministic: bool = True
    ) -> Dict[str, Any]:
        raw_outputs = {}
        decoded_boxes = []
        decoded_scores = []
        decoded_cls_scores = []
        decoded_cls_idx = []
        for scale_idx, key in enumerate(SCALE_ORDER):
            feat = features[key]
            raw = YOLOPredictionHead(
                num_classes=self.num_classes,
                num_anchors=self.num_anchors,
                head_channels=self.head_channels,
                sk_iters=self.sk_iters,
                use_mhc=self.use_mhc,
                dtype=self.dtype,
                monitor=self.monitor,
                precomputed_constraints=self.precomputed_constraints,
                use_pallas=self.use_pallas,
                act_quant=self.act_quant,
                quant_calib=self.quant_calib,
                name=f"head_{key}",
            )(feat, deterministic)
            raw_outputs[key] = raw
            h, w = raw.shape[1], raw.shape[2]
            anchor_grid = jnp.asarray(
                make_anchor_grid(
                    h, w, effective_anchors(scale_idx, h, self.anchors)
                )
            )
            dec = decode_predictions(raw, anchor_grid)
            b = raw.shape[0]
            decoded_boxes.append(dec["boxes"].reshape(b, -1, 4))
            decoded_scores.append(dec["scores"].reshape(b, -1, self.num_classes))
            # Reduce per scale so the NMS path never materializes the big
            # concatenated [B, N, C] product (HBM-bandwidth lever).
            decoded_cls_scores.append(dec["class_scores"].reshape(b, -1))
            decoded_cls_idx.append(dec["class_indices"].reshape(b, -1))

        boxes = jnp.concatenate(decoded_boxes, axis=1)  # [B, N, 4] normalized xyxy
        scores = jnp.concatenate(decoded_scores, axis=1)  # [B, N, C]
        return {
            "raw": raw_outputs,
            "boxes": boxes,
            "scores": scores,
            "class_scores": jnp.concatenate(decoded_cls_scores, axis=1),
            "class_indices": jnp.concatenate(decoded_cls_idx, axis=1).astype(jnp.int32),
        }


def postprocess_detections(
    outputs: Dict[str, jax.Array],
    score_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    max_detections: int = 100,
    pre_nms_top_k: int = 512,
    nms_method: str = "hard",
) -> NMSResult:
    """On-device batched postprocess: confidence -> class-aware NMS -> top-K.

    Input is the :class:`YOLODetectionHead` output dict; result is a fixed-size
    :class:`NMSResult` with normalized xyxy boxes. Replaces the host round-trip
    in the reference (src/inference/postprocessing.py:114-215).
    """
    kwargs = dict(
        score_threshold=score_threshold,
        max_detections=max_detections,
        pre_nms_top_k=pre_nms_top_k,
    )
    if nms_method == "hard":
        kwargs["iou_threshold"] = iou_threshold
    return batched_nms(
        outputs["boxes"],
        outputs["class_scores"],
        outputs["class_indices"],
        method=nms_method,
        **kwargs,
    )
