"""All-HBM data pipeline: the dataset lives in device memory; batches are
sampled and AUGMENTED on device, inside the jitted train step.

TPU-native replacement for the reference's host-side torch DataLoader loop
(reference: src/data/dataloader.py:1-168 ships every batch host->GPU each
step; src/data/transforms.py:65-149 runs albumentations on host CPUs).
On a thin-host TPU deployment that design is the throughput ceiling: the
round-2 stability run measured 1.93 steps/s with the device >80% idle,
dominated by host JPEG/augment work (1 CPU core) and host->HBM batch
transfers (which this environment's tunnel degrades to ~35 MB/s after the
first device->host metrics pull — see .claude/skills/verify/SKILL.md).

The idiomatic TPU answer for datasets that fit in HBM (the 4.5k-image
shapes benchmark is ~5 GB at 640^2 uint8; v5e HBM is 16 GB):

  1. decode + pad ONCE on host at startup, upload uint8 arrays to HBM while
     the process link is still clean (~1.7 GB/s);
  2. every train step gathers a random batch and applies augmentations
     (flip, color jitter, zoom/translate crop with box remapping) as pure
     XLA ops fused into the step — zero host involvement;
  3. the host loop only runs every `chunk` steps (lax.scan over the step),
     pulling a small stacked-metrics array.

Augmentation parity: horizontal flip + color jitter + random scale/translate
(covers RandomResizedCrop/ShiftScaleRotate; reference transforms.py:65-149).
Mosaic is deliberately absent — the hardened shapes benchmark bakes scale
diversity and crowding into the data itself (data/shapes.py SIZE_BUCKETS).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import IMAGENET_MEAN, IMAGENET_STD


class DeviceData(NamedTuple):
    """Dataset-resident-in-HBM arrays (a pytree — pass as a jit argument, do
    NOT close over it: closed-over constants are baked into the jaxpr)."""

    images: jax.Array  # [N, S, S, 3] uint8
    boxes: jax.Array   # [N, M, 4] float32 normalized cxcywh
    labels: jax.Array  # [N, M] int32
    mask: jax.Array    # [N, M] float32 (1 = real box)


@dataclass(frozen=True)
class AugmentConfig:
    """On-device augmentation knobs (reference: AugmentationConfig +
    transforms.py:65-149)."""

    flip_prob: float = 0.5
    brightness: float = 0.2
    contrast: float = 0.25
    channel_gain: float = 0.08
    zoom_min: float = 0.6
    zoom_max: float = 1.5
    min_box_px: float = 3.0
    fill: float = 114.0 / 255.0  # letterbox pad color (inference_config pad 114)


def load_coco_arrays(
    root: str,
    split: str,
    max_boxes: int = 64,
    limit: Optional[int] = None,
    dense: bool = False,
):
    """Decode a (square, uniform-size) COCO-format split into stacked arrays.

    One-time host cost at startup; the shapes benchmark writes uniform square
    frames (data/shapes.py), which is what makes whole-dataset residency
    possible without per-image letterboxing.

    ``dense=True`` additionally loads per-pixel class masks
    (``masks/<split>/*.png``, uint8) and depth maps (``depth/<split>/*.png``,
    uint16 mm -> float32 m) written by ``generate_dataset(with_dense=True)``
    and returns them as trailing arrays.
    """
    import cv2

    ann_path = os.path.join(root, "annotations", f"instances_{split}.json")
    with open(ann_path) as f:
        ann = json.load(f)
    images_meta = ann["images"][:limit] if limit else ann["images"]
    by_image: Dict[int, list] = {m["id"]: [] for m in images_meta}
    for a in ann["annotations"]:
        if a["image_id"] in by_image:
            by_image[a["image_id"]].append(a)

    n = len(images_meta)
    size = int(images_meta[0]["height"])
    images = np.empty((n, size, size, 3), np.uint8)
    boxes = np.zeros((n, max_boxes, 4), np.float32)
    labels = np.zeros((n, max_boxes), np.int32)
    mask = np.zeros((n, max_boxes), np.float32)
    seg = np.empty((n, size, size), np.uint8) if dense else None
    depth = np.empty((n, size, size), np.float32) if dense else None
    for i, meta in enumerate(images_meta):
        assert meta["height"] == size and meta["width"] == size, (
            "device pipeline requires uniform square frames"
        )
        def _read(path: str, flags: int = cv2.IMREAD_COLOR) -> np.ndarray:
            img = cv2.imread(path, flags)
            if img is None:
                raise FileNotFoundError(
                    f"missing or unreadable image: {path}"
                )
            return img

        bgr = _read(os.path.join(root, split, meta["file_name"]))
        images[i] = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        if dense:
            stem = meta["file_name"].replace(".jpg", ".png")
            seg[i] = _read(
                os.path.join(root, "masks", split, stem), cv2.IMREAD_UNCHANGED
            )
            depth[i] = _read(
                os.path.join(root, "depth", split, stem), cv2.IMREAD_UNCHANGED
            ).astype(np.float32) / 1000.0
        for j, a in enumerate(by_image[meta["id"]][:max_boxes]):
            x, y, w, h = a["bbox"]
            boxes[i, j] = ((x + w / 2) / size, (y + h / 2) / size,
                           w / size, h / size)
            labels[i, j] = a["category_id"] - 1  # COCO ids are 1-based
            mask[i, j] = 1.0
    if dense:
        return images, boxes, labels, mask, seg, depth
    return images, boxes, labels, mask


def put_device_data(
    images: np.ndarray,
    boxes: np.ndarray,
    labels: np.ndarray,
    mask: np.ndarray,
    mesh=None,
) -> DeviceData:
    """Upload the dataset to HBM (replicated over the mesh — every chip holds
    a copy so batch gathers stay local; the batch itself shards over 'data')."""
    if mesh is not None:
        from ..parallel.mesh import replicated

        sharding = replicated(mesh)
        put = lambda x: jax.device_put(x, sharding)
    else:
        put = jax.device_put
    return DeviceData(put(images), put(boxes), put(labels), put(mask))


def _warp_images(
    imgs: jax.Array, scale: jax.Array, tx: jax.Array, ty: jax.Array,
    out_size: int, fill: float,
) -> jax.Array:
    """Per-sample affine zoom/translate to a fixed output frame.

    A point at input pixel p lands at output pixel p*scale + t
    (jax.image.scale_and_translate semantics); out-of-source pixels get the
    letterbox fill color via an analytic coverage box (no second resize).
    """
    b, s = imgs.shape[0], imgs.shape[1]

    def one(img, sc, tx1, ty1):
        return jax.image.scale_and_translate(
            img, (out_size, out_size, 3), (0, 1),
            jnp.stack([sc, sc]), jnp.stack([ty1, tx1]),
            method="linear", antialias=True,
        )

    out = jax.vmap(one)(imgs, scale, tx, ty)
    xs = jnp.arange(out_size, dtype=jnp.float32)
    inside_x = (xs[None, :] >= tx[:, None]) & (xs[None, :] <= tx[:, None] + s * scale[:, None])
    inside_y = (xs[None, :] >= ty[:, None]) & (xs[None, :] <= ty[:, None] + s * scale[:, None])
    cov = (inside_y[:, :, None] & inside_x[:, None, :]).astype(out.dtype)[..., None]
    return out * cov + fill * (1.0 - cov)


def _normalize(imgs: jax.Array) -> jax.Array:
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (imgs - mean) / std


def sample_batch(
    data: DeviceData,
    rng: jax.Array,
    batch_size: int,
    out_size: int,
    aug: AugmentConfig = AugmentConfig(),
    augment: bool = True,
) -> Dict[str, jax.Array]:
    """Draw + augment one training batch entirely on device (jit-pure).

    Returns the trainer's batch dict: normalized float images [B,O,O,3],
    normalized cxcywh boxes [B,M,4], labels [B,M], box_mask [B,M].
    """
    n, s = data.images.shape[0], data.images.shape[1]
    k_idx, k_flip, k_bright, k_con, k_gain, k_zoom, k_tx, k_ty = (
        jax.random.split(rng, 8)
    )
    idx = jax.random.randint(k_idx, (batch_size,), 0, n)
    imgs = data.images[idx].astype(jnp.float32) / 255.0
    boxes = data.boxes[idx]
    labels = data.labels[idx]
    mask = data.mask[idx]

    if augment:
        # --- color jitter (per-sample brightness/contrast, per-channel gain).
        bright = jax.random.uniform(
            k_bright, (batch_size, 1, 1, 1), minval=-aug.brightness, maxval=aug.brightness
        )
        con = jax.random.uniform(
            k_con, (batch_size, 1, 1, 1), minval=1 - aug.contrast, maxval=1 + aug.contrast
        )
        gain = jax.random.uniform(
            k_gain, (batch_size, 1, 1, 3),
            minval=1 - aug.channel_gain, maxval=1 + aug.channel_gain,
        )
        mean_px = jnp.mean(imgs, axis=(1, 2, 3), keepdims=True)
        imgs = (imgs - mean_px) * con + mean_px + bright
        imgs = jnp.clip(imgs * gain, 0.0, 1.0)

        # --- horizontal flip (image + box cx).
        do_flip = jax.random.bernoulli(k_flip, aug.flip_prob, (batch_size,))
        imgs = jnp.where(do_flip[:, None, None, None], imgs[:, :, ::-1, :], imgs)
        cx = jnp.where(do_flip[:, None], 1.0 - boxes[..., 0], boxes[..., 0])
        boxes = boxes.at[..., 0].set(cx)

        # --- zoom + translate into the output frame.
        z = jax.random.uniform(
            k_zoom, (batch_size,), minval=aug.zoom_min, maxval=aug.zoom_max
        )
        scale = z * out_size / s
        span = s * scale
        t_lo_x = jnp.minimum(0.0, out_size - span)
        t_hi_x = jnp.maximum(0.0, out_size - span)
        tx = t_lo_x + jax.random.uniform(k_tx, (batch_size,)) * (t_hi_x - t_lo_x)
        ty = t_lo_x + jax.random.uniform(k_ty, (batch_size,)) * (t_hi_x - t_lo_x)
        imgs = _warp_images(imgs, scale, tx, ty, out_size, aug.fill)

        # --- boxes through the same affine (normalized coords).
        cxp = (boxes[..., 0] * s * scale[:, None] + tx[:, None]) / out_size
        cyp = (boxes[..., 1] * s * scale[:, None] + ty[:, None]) / out_size
        wp = boxes[..., 2] * s * scale[:, None] / out_size
        hp = boxes[..., 3] * s * scale[:, None] / out_size
        # Clip to the frame, drop boxes that shrank away or left the frame.
        x1 = jnp.clip(cxp - wp / 2, 0.0, 1.0)
        y1 = jnp.clip(cyp - hp / 2, 0.0, 1.0)
        x2 = jnp.clip(cxp + wp / 2, 0.0, 1.0)
        y2 = jnp.clip(cyp + hp / 2, 0.0, 1.0)
        boxes = jnp.stack(
            [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
        )
        min_frac = aug.min_box_px / out_size
        visible = (boxes[..., 2] > min_frac) & (boxes[..., 3] > min_frac)
        mask = mask * visible.astype(mask.dtype)
    elif out_size != s:
        scale = jnp.full((batch_size,), out_size / s, jnp.float32)
        zero = jnp.zeros((batch_size,), jnp.float32)
        imgs = _warp_images(imgs, scale, zero, zero, out_size, aug.fill)
        # Normalized boxes are scale-invariant under uniform resize.

    return {
        "images": _normalize(imgs),
        "boxes": boxes,
        "labels": labels,
        "box_mask": mask,
    }


def eval_batch(
    data: DeviceData, start: jax.Array, batch_size: int, out_size: int,
    fill: float = 114.0 / 255.0,
) -> Dict[str, jax.Array]:
    """Deterministic contiguous batch (validation): resize only, no augs."""
    s = data.images.shape[1]
    imgs = jax.lax.dynamic_slice_in_dim(data.images, start, batch_size, 0)
    imgs = imgs.astype(jnp.float32) / 255.0
    if out_size != s:
        scale = jnp.full((batch_size,), out_size / s, jnp.float32)
        zero = jnp.zeros((batch_size,), jnp.float32)
        imgs = _warp_images(imgs, scale, zero, zero, out_size, fill)
    return {
        "images": _normalize(imgs),
        "boxes": jax.lax.dynamic_slice_in_dim(data.boxes, start, batch_size, 0),
        "labels": jax.lax.dynamic_slice_in_dim(data.labels, start, batch_size, 0),
        "box_mask": jax.lax.dynamic_slice_in_dim(data.mask, start, batch_size, 0),
    }
