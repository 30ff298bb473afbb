"""On-device data pipeline tests: sampling, augmentation box math, chunking.

The pipeline is the round-3 throughput fix (dataset resident in device
memory, augs inside the jitted step) — these tests pin the geometry so box
remapping can't silently rot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvs_tpu.constants import IMAGENET_MEAN, IMAGENET_STD
from hvs_tpu.data import AugmentConfig, DeviceData, eval_batch, sample_batch


def _make_data(n=4, s=64, m=8):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (n, s, s, 3), np.uint8)
    boxes = np.zeros((n, m, 4), np.float32)
    labels = np.zeros((n, m), np.int32)
    mask = np.zeros((n, m), np.float32)
    # One known box per image: centered at (0.25, 0.5), size 0.2 x 0.3.
    boxes[:, 0] = (0.25, 0.5, 0.2, 0.3)
    labels[:, 0] = 3
    mask[:, 0] = 1.0
    return DeviceData(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(mask),
    )


def test_no_aug_passthrough_and_normalization():
    data = _make_data()
    batch = sample_batch(
        data, jax.random.PRNGKey(0), batch_size=2, out_size=64, augment=False
    )
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["boxes"].shape == (2, 8, 4)
    # Invert the normalization to recover [0, 1] pixels.
    img = np.asarray(batch["images"]) * np.asarray(IMAGENET_STD) + np.asarray(
        IMAGENET_MEAN
    )
    assert img.min() >= -1e-5 and img.max() <= 1.0 + 1e-5
    np.testing.assert_allclose(
        np.asarray(batch["boxes"][0, 0]), [0.25, 0.5, 0.2, 0.3], atol=1e-6
    )


def test_no_aug_resize_keeps_normalized_boxes():
    data = _make_data(s=64)
    batch = sample_batch(
        data, jax.random.PRNGKey(1), batch_size=2, out_size=32, augment=False
    )
    assert batch["images"].shape == (2, 32, 32, 3)
    np.testing.assert_allclose(
        np.asarray(batch["boxes"][0, 0]), [0.25, 0.5, 0.2, 0.3], atol=1e-6
    )


def test_flip_box_math():
    data = _make_data()
    aug = AugmentConfig(
        flip_prob=1.0, brightness=0.0, contrast=0.0, channel_gain=0.0,
        zoom_min=1.0, zoom_max=1.0,
    )
    batch = sample_batch(
        data, jax.random.PRNGKey(2), batch_size=4, out_size=64, aug=aug
    )
    b = np.asarray(batch["boxes"][0, 0])
    # cx mirrored, everything else preserved (zoom=1 -> identity warp).
    np.testing.assert_allclose(b, [0.75, 0.5, 0.2, 0.3], atol=1e-5)
    assert np.asarray(batch["box_mask"][0, 0]) == 1.0


def test_zoom_out_scales_boxes_and_fills_background():
    data = _make_data()
    aug = AugmentConfig(
        flip_prob=0.0, brightness=0.0, contrast=0.0, channel_gain=0.0,
        zoom_min=0.5, zoom_max=0.5,
    )
    batch = sample_batch(
        data, jax.random.PRNGKey(3), batch_size=4, out_size=64, aug=aug
    )
    b = np.asarray(batch["boxes"][0, 0])
    # Box w/h shrink by exactly the zoom factor.
    np.testing.assert_allclose(b[2:], [0.1, 0.15], atol=1e-5)
    assert np.asarray(batch["box_mask"][0, 0]) == 1.0
    # The un-covered region carries the letterbox fill color (114/255),
    # normalized; at zoom 0.5 at least 3/4 of the frame is fill.
    img = np.asarray(batch["images"][0]) * np.asarray(IMAGENET_STD) + np.asarray(
        IMAGENET_MEAN
    )
    fill_frac = np.mean(np.all(np.abs(img - 114.0 / 255.0) < 1e-3, axis=-1))
    assert fill_frac >= 0.70


def test_tiny_boxes_get_masked_after_extreme_zoom_out():
    data = _make_data()
    # Shrink the known 0.2x0.3 box at 64px output below the 3px floor.
    aug = AugmentConfig(
        flip_prob=0.0, brightness=0.0, contrast=0.0, channel_gain=0.0,
        zoom_min=0.2, zoom_max=0.2, min_box_px=3.0,
    )
    batch = sample_batch(
        data, jax.random.PRNGKey(4), batch_size=4, out_size=64, aug=aug
    )
    # 0.2 * 0.2 * 64 = 2.56 px < 3 px -> dropped.
    assert np.asarray(batch["box_mask"]).sum() == 0.0


def test_eval_batch_contiguous_slice():
    data = _make_data(n=6)
    batch = eval_batch(data, jnp.asarray(2), batch_size=2, out_size=64)
    np.testing.assert_array_equal(
        np.asarray(batch["labels"]), np.asarray(data.labels[2:4])
    )


def test_sample_batch_is_jittable_and_deterministic():
    data = _make_data()
    f = jax.jit(
        lambda d, k: sample_batch(d, k, batch_size=2, out_size=32)
    )
    b1 = f(data, jax.random.PRNGKey(7))
    b2 = f(data, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(b1["images"]), np.asarray(b2["images"]))
    b3 = f(data, jax.random.PRNGKey(8))
    assert not np.array_equal(np.asarray(b1["images"]), np.asarray(b3["images"]))


@pytest.mark.slow
@pytest.mark.heavy
def test_train_chunk_end_to_end_tiny():
    """Two scanned steps with on-device sampling on a tiny model."""
    from hvs_tpu.models import HybridVisionSystem
    from hvs_tpu.training import ManifoldConstrainedTrainer, TrainerConfig

    model = HybridVisionSystem(
        num_classes=4, use_vit=False, base_channels=8,
        stage_blocks=(1, 1, 1, 1), stage_channels=(8, 12, 16, 20),
        fpn_channels=16, head_channels=16, feature_dim=16, sk_iters=5,
        monitor=True,
    )
    cfg = TrainerConfig(
        num_classes=4, sk_iters=5, warmup_steps=2, total_steps=20,
        stability_check_every=2, metrics_log=None,
    )
    trainer = ManifoldConstrainedTrainer(model, cfg)
    data = _make_data(n=8, s=64)
    trainer.init_state({
        "images": np.zeros((2, 64, 64, 3), np.float32),
        "boxes": np.zeros((2, 8, 4), np.float32),
        "labels": np.zeros((2, 8), np.int32),
        "box_mask": np.zeros((2, 8), np.float32),
    })
    rows = []
    result = trainer.train_chunked(
        data, total_steps=4, batch_size=2, out_sizes=(64,), chunk_steps=2,
        val_data=data, val_every_chunks=2, val_batch_size=2,
        eig_every_chunks=1, progress_fn=rows.append,
    )
    assert len(rows) == 2
    assert np.isfinite(rows[-1]["loss"])
    assert rows[-1]["ds_error_max"] is not None  # telemetry recorded
    assert "eig_max_eigenvalue" in rows[-1]
    assert rows[-1]["eig_max_eigenvalue"] <= 1.1  # DS => spectral radius <= 1
    assert result["best_val_loss"] < float("inf")
