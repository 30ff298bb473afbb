"""Training: losses, manifold-aware optimization, schedules, trainer, stability.

Export surface mirrors the reference training package
(reference: src/training/__init__.py:13-30).
"""

from .losses import (
    LossWeights,
    build_targets,
    focal_bce,
    bce_with_smoothing,
    mhc_yolo_loss,
    manifold_regularization_loss,
    multi_task_loss,
    iter_h_res_leaves,
)
from .optimizer import (
    make_optimizer,
    mhc_partition,
    is_mhc_path,
    tangent_precondition,
    periodic_sinkhorn_projection,
    doubly_stochastic_projection,
)
from .schedule import (
    cosine_annealing_with_warmup,
    PlateauSchedulerWithReset,
    ManifoldAwareScheduler,
)
from .stability import (
    StabilityThresholds,
    StabilityMonitor,
    TrainingStabilityMetrics,
    make_eig_telemetry,
)
from .trainer import (
    TrainState,
    TrainerConfig,
    make_train_step,
    make_eval_step,
    make_train_chunk,
    make_val_chunk,
    ManifoldConstrainedTrainer,
    global_norm,
)

__all__ = [
    "LossWeights",
    "build_targets",
    "focal_bce",
    "bce_with_smoothing",
    "mhc_yolo_loss",
    "manifold_regularization_loss",
    "multi_task_loss",
    "iter_h_res_leaves",
    "make_optimizer",
    "mhc_partition",
    "is_mhc_path",
    "tangent_precondition",
    "periodic_sinkhorn_projection",
    "doubly_stochastic_projection",
    "cosine_annealing_with_warmup",
    "PlateauSchedulerWithReset",
    "ManifoldAwareScheduler",
    "StabilityThresholds",
    "StabilityMonitor",
    "TrainingStabilityMetrics",
    "make_eig_telemetry",
    "make_train_chunk",
    "make_val_chunk",
    "TrainState",
    "TrainerConfig",
    "make_train_step",
    "make_eval_step",
    "ManifoldConstrainedTrainer",
    "global_norm",
]
