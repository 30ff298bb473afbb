"""Learning-rate schedules: warmup-cosine, plateau-with-reset, manifold-aware.

TPU-native redesign of the reference schedulers
(reference: src/training/scheduler.py:19-449). The warmup-cosine schedule is a
pure function of the step (jit-friendly, feeds optax directly); the plateau and
manifold-aware schedulers are host-side controllers that emit a multiplicative
``lr_scale`` consumed by the train state — the jitted step never recompiles
when the scale changes because it enters as data, not as a constant.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np
import optax


def cosine_annealing_with_warmup(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    min_lr_ratio: float = 0.01,
) -> optax.Schedule:
    """Linear warmup then cosine decay
    (reference: CosineAnnealingWithWarmup, src/training/scheduler.py:19-135)."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        progress = jnp.clip(
            (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos = base_lr * (
            min_lr_ratio + (1 - min_lr_ratio) * 0.5 * (1 + jnp.cos(jnp.pi * progress))
        )
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


@dataclass
class PlateauSchedulerWithReset:
    """Reduce-on-plateau with optional warm restarts, host-side
    (reference: src/training/scheduler.py:137-304).

    Emits a multiplicative factor; call :meth:`step` with the monitored metric.
    """

    factor: float = 0.5
    patience: int = 5
    threshold: float = 1e-3
    min_scale: float = 1e-3
    reset_after: Optional[int] = None  # reductions before a warm restart

    scale: float = 1.0
    best: float = float("inf")
    bad_epochs: int = 0
    num_reductions: int = 0

    def step(self, metric: float) -> float:
        if metric < self.best - self.threshold:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.bad_epochs = 0
            self.num_reductions += 1
            if self.reset_after and self.num_reductions >= self.reset_after:
                self.scale = 1.0
                self.num_reductions = 0
                self.best = float("inf")
            else:
                self.scale = max(self.scale * self.factor, self.min_scale)
        return self.scale


@dataclass
class ManifoldAwareScheduler:
    """Scale LR down when stability thresholds are exceeded
    (reference: ManifoldAwareScheduler, src/training/scheduler.py:306-449).

    Thresholds mirror the reference's defaults: gradient-norm, Sinkhorn error,
    and eigenvalue-excess triggers each multiply the scale down; the scale
    recovers slowly when all metrics are healthy.
    """

    grad_norm_threshold: float = 10.0
    sk_error_threshold: float = 0.01
    eigenvalue_threshold: float = 1.1
    reduction_factor: float = 0.7
    recovery_factor: float = 1.02
    min_scale: float = 1e-3
    max_scale: float = 1.0

    scale: float = 1.0
    history: list = field(default_factory=list)

    def step(self, metrics: Dict[str, float]) -> float:
        unstable = False
        if metrics.get("grad_norm", 0.0) > self.grad_norm_threshold:
            unstable = True
        if metrics.get("ds_error_max", 0.0) > self.sk_error_threshold:
            unstable = True
        if metrics.get("max_eigenvalue", 0.0) > self.eigenvalue_threshold:
            unstable = True
        if unstable:
            self.scale = max(self.scale * self.reduction_factor, self.min_scale)
        else:
            self.scale = min(self.scale * self.recovery_factor, self.max_scale)
        self.history.append(self.scale)
        return self.scale
