"""Multi-task loss unit tests — segmentation class balancing + Dice term
(reference objective: MultiTaskLoss, src/training/loss_functions.py:309-489;
the class-balanced CE + Dice design addresses the r3 evidence that plain
mean-CE leaves rare classes at IoU ~0.008, MULTITASK_r03.json)."""

import jax
import jax.numpy as jnp
import numpy as np

from hvs_tpu.training.losses import multi_task_loss


def _seg_outputs(logits, labels):
    return {"segmentation": logits}, {"seg_labels": labels}


def test_seg_loss_balanced_rare_class_dominates_uniform_error():
    """With 99% background pixels, a model that ignores the rare class must
    be penalized far more under balanced CE than one that ignores an equal
    number of background pixels."""
    k = 3
    labels = np.zeros((1, 32, 32), np.int32)
    labels[0, :2, :8] = 1  # 16 rare-class pixels
    logits_ignore_rare = np.full((1, 32, 32, k), -10.0, np.float32)
    logits_ignore_rare[..., 0] = 10.0  # predicts background everywhere
    out, batch = _seg_outputs(jnp.asarray(logits_ignore_rare), jnp.asarray(labels))
    _, m_rare = multi_task_loss(out, batch, num_classes=k - 1)

    # Same pixel-count of errors, but on the majority class.
    logits_ignore_bg = logits_ignore_rare.copy()
    ys, xs = np.nonzero(labels[0] == 1)
    logits_ignore_bg[0, ys, xs, 1] = 10.0
    logits_ignore_bg[0, ys, xs, 0] = -10.0  # rare class now correct
    logits_ignore_bg[0, 30:, :8, 0] = -10.0
    logits_ignore_bg[0, 30:, :8, 2] = 10.0  # 16 background pixels wrong
    out, batch = _seg_outputs(jnp.asarray(logits_ignore_bg), jnp.asarray(labels))
    _, m_bg = multi_task_loss(out, batch, num_classes=k - 1)

    assert float(m_rare["segmentation_loss"]) > 3 * float(
        m_bg["segmentation_loss"]
    ), (float(m_rare["segmentation_loss"]), float(m_bg["segmentation_loss"]))


def test_seg_loss_perfect_prediction_near_zero():
    k = 4
    rng = np.random.default_rng(0)
    labels = rng.integers(0, k, (2, 16, 16)).astype(np.int32)
    logits = np.full((2, 16, 16, k), -20.0, np.float32)
    for c in range(k):
        logits[..., c] = np.where(labels == c, 20.0, -20.0)
    out, batch = _seg_outputs(jnp.asarray(logits), jnp.asarray(labels))
    _, m = multi_task_loss(out, batch, num_classes=k - 1)
    assert float(m["segmentation_loss"]) < 0.05
    assert float(m["segmentation_dice_loss"]) < 0.05


def test_seg_loss_downsamples_labels_and_stays_finite_in_grad():
    k = 3
    labels = jnp.asarray(
        np.random.default_rng(1).integers(0, k, (1, 64, 64)), jnp.int32
    )

    def loss_of(logits):
        out, batch = _seg_outputs(logits, labels)
        total, _ = multi_task_loss(out, batch, num_classes=k - 1)
        return total

    logits = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 32, 32, k)), jnp.float32
    )
    g = jax.grad(loss_of)(logits)
    assert g.shape == logits.shape
    assert bool(jnp.all(jnp.isfinite(g)))


def test_seg_loss_absent_class_contributes_nothing():
    """A class with zero pixels in the batch must not contribute to the CE
    weights or the Dice average (no NaN, no phantom penalty)."""
    k = 5
    labels = jnp.zeros((1, 16, 16), jnp.int32)  # only background present
    logits = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 16, 16, k)), jnp.float32
    )
    out, batch = _seg_outputs(logits, labels)
    total, m = multi_task_loss(out, batch, num_classes=k - 1)
    assert np.isfinite(float(total))
    assert np.isfinite(float(m["segmentation_dice_loss"]))
