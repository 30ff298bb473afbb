"""Round-2 training features: EMA persistence + EMA eval, adaptive LR
controllers actually driving lr_scale, and spike-proof stability checks
(reference: TrainingConfig.ema_decay; scheduler.py:137-449;
stability_monitor.py:164-397)."""

import json

import jax
import numpy as np
import pytest

from hvs_tpu.models import HybridVisionSystem
from hvs_tpu.parallel import make_mesh
from hvs_tpu.training import ManifoldConstrainedTrainer, TrainerConfig

from tests.test_training import (
    BASE_TRAINER_KW, EMA_TRAINER_KW, TINY, synthetic_batch,
)


def _make_trainer(tmp_path, ema=False, **host_kw):
    """Trainer over the suite-shared traced variants (see BASE_TRAINER_KW):
    only host-side knobs may be passed in ``host_kw`` — traced fields, batch
    shape, and mesh are pinned so every call here reuses a cached jitted
    step instead of paying a fresh multi-minute CPU trace."""
    model = HybridVisionSystem(**TINY)
    cfg = TrainerConfig(
        **(EMA_TRAINER_KW if ema else BASE_TRAINER_KW),
        checkpoint_dir=str(tmp_path), **host_kw,
    )
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    t = ManifoldConstrainedTrainer(model, cfg, mesh=mesh)
    t.init_state(synthetic_batch())
    return t


@pytest.fixture(scope="module")
def ema_trainer(tmp_path_factory):
    t = _make_trainer(
        tmp_path_factory.mktemp("ema_ckpt"), ema=True, use_plateau=True,
        plateau_patience=0, plateau_factor=0.5, stability_check_every=1000,
    )
    for i in range(3):
        t.train_step(synthetic_batch(seed=i))
    return t


@pytest.mark.heavy
def test_ema_checkpoint_roundtrip(ema_trainer):
    """ema_params must survive save -> load, not just params.

    Heavy lane: orbax save/restore + post-restore retrace costs ~30 s of
    unique XLA CPU programs; default-lane EMA coverage stays via
    test_ema_used_for_eval, checkpoint coverage via test_step_checkpointing."""
    t = ema_trainer
    ema_before = jax.tree_util.tree_leaves(t.state.ema_params)[0].copy()
    path = t.save_checkpoint("ema_test")

    # Wreck the live EMA, then restore.
    wrecked = jax.tree_util.tree_map(lambda x: x * 0.0, t.state.ema_params)
    t.state = t.state.replace(ema_params=wrecked)
    t.load_checkpoint(path)
    ema_after = jax.tree_util.tree_leaves(t.state.ema_params)[0]
    np.testing.assert_allclose(np.asarray(ema_after), np.asarray(ema_before))


def test_ema_used_for_eval(ema_trainer):
    """validate(use_ema=True) must evaluate the EMA weights."""
    t = ema_trainer
    p_eval = t.eval_params(use_ema=True)
    p_raw = t.eval_params(use_ema=False)
    l_ema = jax.tree_util.tree_leaves(p_eval)[0]
    l_raw = jax.tree_util.tree_leaves(p_raw)[0]
    assert not np.allclose(np.asarray(l_ema), np.asarray(l_raw))

    ema_metrics = t.validate([synthetic_batch(seed=9)], use_ema=True)
    raw_metrics = t.validate([synthetic_batch(seed=9)], use_ema=False)
    assert ema_metrics["val_loss"] != raw_metrics["val_loss"]


def test_plateau_scheduler_changes_effective_lr(ema_trainer):
    """A non-improving val loss must reduce lr_scale mid-run (patience=0).

    validate() is stubbed to a constant: real training on the tiny random
    model can legitimately improve val loss every epoch, which would test the
    SGD dynamics rather than the scheduler. The integration wiring under test
    (train -> plateau.step -> _sync_lr_scale -> state.lr_scale) stays real.
    """
    t = ema_trainer
    before = float(t.state.lr_scale)
    t.validate = lambda loader, **kw: {"val_loss": 1.0}
    # Stub the incidental best-checkpoint save too: a real orbax save costs
    # ~10 s here and checkpoint coverage lives in test_step_checkpointing.
    t.save_checkpoint = lambda name: ""
    try:
        loader = lambda: iter([synthetic_batch(seed=100)])
        # epoch 1: best=1.0; epoch 2: no improvement -> bad_epochs=1 > 0
        t.train(loader, val_loader_fn=loader, epochs=2)
    finally:
        del t.validate  # restore the class method for later tests
        del t.save_checkpoint
    after = float(t.state.lr_scale)
    assert after < before, (before, after)
    assert t.plateau.num_reductions >= 1


def test_spike_between_checks_still_alerts(tmp_path):
    """A grad-norm spike on a non-check step must surface at the next check
    (the round-1 monitor sampled every N steps and missed a 210-norm spike)."""
    # Pin the alert threshold: the DEFAULT is calibrated to real pre-clip
    # norms (2000); this test exercises the between-checks windowing, so it
    # needs a threshold the injected spike crosses.
    t = _make_trainer(
        tmp_path, stability_check_every=4, grad_explosion_threshold=100.0
    )
    # Simulate the epoch loop's bookkeeping with a synthetic spike injected
    # into the window between checks.
    t._window_max = {}
    fake = [
        {"loss": 5.0, "grad_norm": 3.0},
        {"loss": 5.0, "grad_norm": 900.0},  # spike on a non-check step
        {"loss": 5.0, "grad_norm": 2.0},
        {"loss": 5.0, "grad_norm": 1.5},   # check lands here
    ]
    for host in fake:
        for k in ("grad_norm", "loss", "ds_error_max", "signal_ratio_mean"):
            if k in host and np.isfinite(host[k]):
                t._window_max[k] = max(t._window_max.get(k, 0.0), host[k])
    check = dict(fake[-1])
    for k in ("grad_norm", "ds_error_max", "signal_ratio_mean"):
        if k in t._window_max:
            check[k] = t._window_max[k]
    report = t.monitor.check_stability(check)
    assert not report["is_stable"]
    assert any("gradient_explosion" in a for a in report["alerts"])


@pytest.mark.heavy
def test_metrics_jsonl_written(tmp_path):
    log_path = tmp_path / "steps.jsonl"
    t = _make_trainer(
        tmp_path, metrics_log=str(log_path), stability_check_every=1000,
    )
    t.train_epoch(iter([synthetic_batch(seed=i) for i in range(2)]), 0)
    rows = [json.loads(l) for l in open(log_path)]
    assert len(rows) == 2
    assert {"step", "loss", "grad_norm", "lr_scale"} <= set(rows[0])


def test_step_checkpointing(tmp_path):
    t = _make_trainer(tmp_path, checkpoint_every_steps=2, stability_check_every=1000)
    t.train_epoch(iter([synthetic_batch(seed=i) for i in range(2)]), 0)
    import os

    assert os.path.isdir(tmp_path / "step_2")


@pytest.mark.heavy
def test_stability_scale_recovers_after_clean_checks(tmp_path):
    """Corrections are a brake, not a ratchet: lr_scale climbs back toward
    1.0 once checks pass clean (reference recovery: scheduler.py:306-449)."""
    t = _make_trainer(tmp_path, stability_check_every=1)
    t._stab_scale = 0.25
    t._sync_lr_scale()
    before = float(t.state.lr_scale)
    t.train_epoch(iter([synthetic_batch(seed=7)]), 0)
    # One clean check must raise the scale by the recovery factor.
    if t.monitor.alerts:  # random tiny-model step tripped a gate: skip
        pytest.skip("synthetic step tripped a stability gate")
    assert float(t.state.lr_scale) > before
