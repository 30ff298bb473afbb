"""Box geometry utilities: format conversion, IoU families, pairwise IoU.

Fully vectorized replacements for the reference's per-pair Python helpers
(reference: src/inference/postprocessing.py:772-802 vectorized IoU,
src/training/loss_functions.py:213-283 CIoU). All functions operate on trailing
``[..., 4]`` axes and are jit/grad-safe with static shapes.

Box formats:
    xyxy:   (x1, y1, x2, y2)
    cxcywh: (cx, cy, w, h)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cxcywh_to_xyxy(boxes: jax.Array) -> jax.Array:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_cxcywh(boxes: jax.Array) -> jax.Array:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_area(boxes: jax.Array) -> jax.Array:
    """Area of xyxy boxes; negative extents clamp to zero."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def box_iou(a: jax.Array, b: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Elementwise IoU of xyxy boxes with broadcasting (``a``, ``b`` -> ``[...]``)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    return inter / (union + eps)


def pairwise_iou(a: jax.Array, b: jax.Array, eps: float = 1e-7) -> jax.Array:
    """All-pairs IoU: ``a`` [N, 4] x ``b`` [M, 4] -> [N, M] (batched on leading dims)."""
    return box_iou(a[..., :, None, :], b[..., None, :, :], eps=eps)


def box_giou(a: jax.Array, b: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Generalized IoU (elementwise, broadcasting)."""
    iou = box_iou(a, b, eps)
    lt = jnp.minimum(a[..., :2], b[..., :2])
    rb = jnp.maximum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    inter_lt = jnp.maximum(a[..., :2], b[..., :2])
    inter_rb = jnp.minimum(a[..., 2:], b[..., 2:])
    inter_wh = jnp.maximum(inter_rb - inter_lt, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    return iou - (hull - union) / (hull + eps)


def box_ciou(a: jax.Array, b: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Complete IoU (elementwise, broadcasting) — IoU minus center-distance and
    aspect-ratio penalties (reference: src/training/loss_functions.py:213-283).

    The aspect term's ``v`` factor is treated as constant w.r.t. gradients through
    the arctan (standard CIoU trick) via ``stop_gradient`` on alpha.
    """
    iou = box_iou(a, b, eps)
    # Enclosing box diagonal.
    lt = jnp.minimum(a[..., :2], b[..., :2])
    rb = jnp.maximum(a[..., 2:], b[..., 2:])
    c2 = jnp.sum((rb - lt) ** 2, axis=-1) + eps
    # Center distance.
    ca = (a[..., :2] + a[..., 2:]) / 2
    cb = (b[..., :2] + b[..., 2:]) / 2
    rho2 = jnp.sum((ca - cb) ** 2, axis=-1)
    # Aspect-ratio consistency.
    wa = jnp.maximum(a[..., 2] - a[..., 0], eps)
    ha = jnp.maximum(a[..., 3] - a[..., 1], eps)
    wb = jnp.maximum(b[..., 2] - b[..., 0], eps)
    hb = jnp.maximum(b[..., 3] - b[..., 1], eps)
    v = (4.0 / (jnp.pi**2)) * (jnp.arctan(wb / hb) - jnp.arctan(wa / ha)) ** 2
    alpha = jax.lax.stop_gradient(v / (1.0 - iou + v + eps))
    return iou - rho2 / c2 - alpha * v


def clip_boxes(boxes: jax.Array, height: float, width: float) -> jax.Array:
    """Clip xyxy boxes to image bounds."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width)
    y1 = jnp.clip(boxes[..., 1], 0.0, height)
    x2 = jnp.clip(boxes[..., 2], 0.0, width)
    y2 = jnp.clip(boxes[..., 3], 0.0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
