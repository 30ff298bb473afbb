"""ManifoldConstrainedTrainer: jitted data-parallel train step + host-side loop.

TPU-native redesign of the reference trainer
(reference: src/training/mhc_trainer.py:46-713). The reference's per-step
Python work — autocast, GradScaler, a Python walk re-running Sinkhorn+eigvalsh
per layer (:299-340), name-based per-parameter clipping (:342-383) — all moves
inside ONE jitted function:

  * forward in bf16 (dtype policy in the modules; no GradScaler needed — bf16
    has fp32's exponent range, loss scaling is a fp16 artifact);
  * differential clipping & the mHC optimizer partition live in the optax chain
    (hvs_tpu.training.optimizer);
  * manifold regularization is computed from the param tree inside the same
    step (hvs_tpu.training.losses.manifold_regularization_loss);
  * stability telemetry arrives as a functional metrics dict.

Host-side remain: the epoch loop, StabilityMonitor polling with automatic
corrections (reference :404-420 — halve LR, raise Sinkhorn iterations; here the
LR correction is an ``lr_scale`` array in the train state so no recompile),
validation, early stopping, and orbax checkpointing (reference :595-656).

Data parallelism: the step is jitted over a ('data','model') mesh with the
batch sharded on 'data' — the gradient all-reduce is XLA's psum over ICI,
replacing DDP/NCCL (reference scripts/train.py:200-207).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training import train_state

from ..parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
from .losses import (
    build_targets,
    manifold_regularization_loss,
    mhc_yolo_loss,
)
from .optimizer import make_optimizer
from .schedule import cosine_annealing_with_warmup
from .stability import StabilityMonitor


class TrainState(train_state.TrainState):
    """Train state with a host-adjustable LR multiplier (stability corrections
    enter as data, not as recompiling constants) and optional parameter EMA
    (reference: TrainingConfig.ema_decay)."""

    lr_scale: jax.Array = struct.field(default_factory=lambda: jnp.ones([], jnp.float32))
    ema_params: Any = None


@dataclass
class TrainerConfig:
    """Hyperparameters (reference: configs/training.yaml + TrainingConfig)."""

    num_classes: int = 80
    learning_rate: float = 1e-3
    weight_decay: float = 0.01
    warmup_steps: int = 1000
    total_steps: int = 100_000
    manifold_reg_alpha: float = 0.01  # reference MHCConfig alpha
    clip_regular: float = 1.0
    clip_mhc: float = 0.5
    mhc_lr_factor: float = 0.5
    project_every: int = 100
    sk_iters: int = 20
    stability_check_every: int = 100
    checkpoint_every_epochs: int = 5
    early_stopping_patience: int = 10
    checkpoint_dir: str = "checkpoints"
    max_boxes: int = 64
    ema_decay: float = 0.0  # 0 disables EMA
    # Class-loss mode (see losses.mhc_yolo_loss): "bce" = the reference's
    # multi-label logistic loss; "softmax" = smoothed softmax CE for
    # single-label taxonomies. cls_pos_weight balances the 1:(C-1)
    # within-cell imbalance in bce mode (num_classes-1 = balanced).
    cls_mode: str = "bce"
    cls_pos_weight: float = 1.0
    backbone_lr_factor: float = 1.0
    # Adaptive LR controllers (reference: scheduler.py:137-449). Both emit a
    # multiplicative lr_scale consumed by the train state as data.
    use_plateau: bool = False
    plateau_patience: int = 5
    plateau_factor: float = 0.5
    use_manifold_schedule: bool = False
    # Long-run instrumentation: per-step JSONL metrics + step-based checkpoints.
    metrics_log: Optional[str] = None
    checkpoint_every_steps: int = 0  # 0 disables
    # Gradient-explosion alert threshold on the PRE-clip global norm. The
    # optax chain clips updates to clip_regular/clip_mhc before they reach the
    # weights, and the pre-clip norm of this YOLO loss naturally sits at
    # ~50-250 with spikes to ~1000 during warmup (measured on the shapes
    # run) — the reference's 100.0 (tuned to its own loss scale) would trip
    # every early check and grind lr_scale to the floor. Real explosions are
    # orders of magnitude larger or non-finite.
    grad_explosion_threshold: float = 2000.0


def global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))


def _prepare_images(images: jax.Array) -> jax.Array:
    """Accept uint8 batches and normalize ON DEVICE: the host ships 1/4 the
    bytes over the (tunneled) host->HBM link, and the divide/subtract fuses
    into the first conv. Float input passes through untouched (assumed
    already normalized by the host pipeline)."""
    if images.dtype == jnp.uint8:
        from ..constants import IMAGENET_MEAN, IMAGENET_STD

        x = images.astype(jnp.float32) / 255.0
        return (x - jnp.asarray(IMAGENET_MEAN, jnp.float32)) / jnp.asarray(
            IMAGENET_STD, jnp.float32
        )
    return images


def make_train_step(
    model,
    config: TrainerConfig,
) -> Callable:
    """Build the jitted train step (the reference's train_step,
    mhc_trainer.py:223-297, as one pure function)."""

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        dropout_rng = jax.random.fold_in(rng, state.step)
        images = _prepare_images(batch["images"])
        h, w = images.shape[1], images.shape[2]
        grids = [(h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]
        targets = build_targets(
            batch["boxes"], batch["labels"], batch["box_mask"], grids, config.num_classes
        )

        def loss_fn(params):
            outputs, coll = model.apply(
                {"params": params},
                images,
                task="detection",
                deterministic=False,
                rngs={"dropout": dropout_rng},
                mutable=["stability"],
            )
            det_loss, det_metrics = mhc_yolo_loss(
                outputs["detection"]["raw"], targets, config.num_classes,
                cls_mode=config.cls_mode, cls_pos_weight=config.cls_pos_weight,
            )
            reg_loss, reg_metrics = manifold_regularization_loss(
                params, sk_iters=config.sk_iters
            )
            loss = det_loss + config.manifold_reg_alpha * reg_loss
            metrics = {**det_metrics, **reg_metrics, "detection_loss": det_loss}
            return loss, (metrics, coll.get("stability", {}))

        (loss, (metrics, stability)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        grad_norm = global_norm(grads)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(
            lambda u: u * state.lr_scale.astype(u.dtype), updates
        )
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if config.ema_decay > 0.0 and new_ema is not None:
            d = config.ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, q: d * e + (1.0 - d) * q.astype(e.dtype), new_ema, new_params
            )
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state,
            ema_params=new_ema,
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = grad_norm
        # Aggregate sown per-layer stability into scalars.
        ds_errs = [
            v["ds_error"] for v in jax.tree_util.tree_leaves(
                stability, is_leaf=lambda x: isinstance(x, dict) and "ds_error" in x
            )
        ]
        if ds_errs:
            metrics["ds_error_max"] = jnp.max(jnp.stack(ds_errs))
            sig = [
                v["signal_ratio"] for v in jax.tree_util.tree_leaves(
                    stability,
                    is_leaf=lambda x: isinstance(x, dict) and "signal_ratio" in x,
                )
            ]
            metrics["signal_ratio_mean"] = jnp.mean(jnp.stack(sig))
        return new_state, metrics

    return train_step


def make_train_chunk(
    model,
    config: TrainerConfig,
    batch_size: int,
    out_size: int,
    chunk_steps: int,
    aug=None,
    augment: bool = True,
) -> Callable:
    """``lax.scan`` over ``chunk_steps`` train steps with ON-DEVICE batch
    sampling/augmentation — the host is out of the hot loop entirely.

    The reference ships every batch host->GPU (src/data/dataloader.py); on a
    thin-host TPU deployment that caps throughput (measured 1.93 steps/s in
    the round-2 run, device mostly idle). One chunk = one dispatch = one
    small stacked-metrics pull.
    """
    from ..data.device_pipeline import AugmentConfig, sample_batch

    aug = aug if aug is not None else AugmentConfig()
    step_fn = make_train_step(model, config)

    def chunk(state: TrainState, data, rng: jax.Array):
        def body(state, _):
            step_rng = jax.random.fold_in(rng, state.step)
            batch = sample_batch(
                data, step_rng, batch_size, out_size, aug, augment=augment
            )
            state, metrics = step_fn(state, batch, step_rng)
            return state, metrics

        state, stacked = jax.lax.scan(body, state, xs=None, length=chunk_steps)
        return state, stacked

    return chunk


def make_val_chunk(
    model, config: TrainerConfig, batch_size: int, out_size: int, n_batches: int
) -> Callable:
    """Scan the on-device validation set once; returns mean val loss."""
    from ..data.device_pipeline import eval_batch

    eval_step = make_eval_step(model, config)

    def val_chunk(params, data):
        def body(i, acc):
            batch = eval_batch(data, i * batch_size, batch_size, out_size)
            m = eval_step(params, batch)
            return acc + m["val_loss"]

        total = jax.lax.fori_loop(0, n_batches, body, jnp.zeros([], jnp.float32))
        return total / n_batches

    return val_chunk


def make_eval_step(model, config: TrainerConfig) -> Callable:
    def eval_step(params, batch: Dict[str, jax.Array]):
        images = _prepare_images(batch["images"])
        h, w = images.shape[1], images.shape[2]
        grids = [(h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]
        targets = build_targets(
            batch["boxes"], batch["labels"], batch["box_mask"], grids, config.num_classes
        )
        outputs = model.apply({"params": params}, images, task="detection")
        loss, metrics = mhc_yolo_loss(
            outputs["detection"]["raw"], targets, config.num_classes,
            cls_mode=config.cls_mode, cls_pos_weight=config.cls_pos_weight,
        )
        return {"val_loss": loss, **{f"val_{k}": v for k, v in metrics.items()}}

    return eval_step


# (model, traced-config fields) -> (tx, jitted train step, jitted eval step).
# Process-lifetime cache; see ManifoldConstrainedTrainer.__init__ for why.
_COMPILED_STEP_CACHE: Dict[tuple, tuple] = {}


class ManifoldConstrainedTrainer:
    """Host-side training driver (reference: ManifoldConstrainedTrainer,
    src/training/mhc_trainer.py:46-713)."""

    def __init__(
        self,
        model,
        config: TrainerConfig = TrainerConfig(),
        mesh=None,
        rng: Optional[jax.Array] = None,
    ):
        self.model = model
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(n_model=1)
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        from .stability import StabilityThresholds

        self.monitor = StabilityMonitor(
            StabilityThresholds(grad_explosion=config.grad_explosion_threshold)
        )
        self.history: Dict[str, list] = {"train_loss": [], "val_loss": []}
        self.best_val_loss = float("inf")
        self.epochs_without_improvement = 0
        # lr_scale = stability corrections x plateau x manifold-aware; each
        # factor is tracked separately so controllers compose without fighting.
        self._stab_scale = 1.0
        from .schedule import ManifoldAwareScheduler, PlateauSchedulerWithReset

        self.plateau = (
            PlateauSchedulerWithReset(
                factor=config.plateau_factor, patience=config.plateau_patience
            )
            if config.use_plateau else None
        )
        self.manifold_sched = (
            ManifoldAwareScheduler() if config.use_manifold_schedule else None
        )
        # Max-since-last-check window: spikes between periodic checks must not
        # slip through (a 500-step run once recorded grad_norm 210 > the 100.0
        # explosion threshold with zero alerts because checks ran every 100).
        self._window_max: Dict[str, float] = {}
        self._metrics_fh = None
        self.schedule = cosine_annealing_with_warmup(
            config.learning_rate, config.warmup_steps, config.total_steps
        )
        # Share the optimizer + jitted steps across trainer instances whose
        # traced computation is identical (flax modules are frozen dataclasses,
        # so equal-architecture models hash equal). Without this every
        # Trainer() re-closes make_train_step over a fresh config object and
        # jax.jit sees a brand-new function: a test suite constructing five
        # tiny trainers paid five full CPU traces of the same graph. Only
        # fields that reach the traced step/optimizer are in the key —
        # host-side knobs (checkpoint_dir, stability thresholds, logging)
        # must NOT fragment the cache.
        key = (
            model,
            config.num_classes, config.sk_iters, config.manifold_reg_alpha,
            config.ema_decay, config.learning_rate, config.warmup_steps,
            config.total_steps, config.weight_decay, config.mhc_lr_factor,
            config.clip_regular, config.clip_mhc, config.project_every,
            config.backbone_lr_factor, config.max_boxes,
            config.cls_mode, config.cls_pos_weight,
        )
        cached = _COMPILED_STEP_CACHE.get(key)
        if cached is None:
            tx = make_optimizer(
                self.schedule,
                weight_decay=config.weight_decay,
                mhc_lr_factor=config.mhc_lr_factor,
                clip_regular=config.clip_regular,
                clip_mhc=config.clip_mhc,
                project_every=config.project_every,
                sk_iters=config.sk_iters,
                backbone_lr_factor=config.backbone_lr_factor,
            )
            cached = (
                tx,
                jax.jit(make_train_step(model, config), donate_argnums=(0,)),
                jax.jit(make_eval_step(model, config)),
            )
            _COMPILED_STEP_CACHE[key] = cached
        self.tx, self._train_step, self._eval_step = cached
        self.state: Optional[TrainState] = None

    # ------------------------------------------------------------------
    def init_state(self, sample_batch: Dict[str, np.ndarray]) -> TrainState:
        images = jnp.asarray(sample_batch["images"])
        # jit the init: eager flax init dispatches thousands of tiny ops
        # (minutes on slow hosts); one compiled graph takes seconds. Cached
        # per model architecture: a fresh partial() per call would make
        # jax.jit retrace the whole init for every trainer instance.
        init_fn = _COMPILED_STEP_CACHE.get(("init", self.model))
        if init_fn is None:
            init_fn = jax.jit(partial(self.model.init, task="detection"))
            _COMPILED_STEP_CACHE[("init", self.model)] = init_fn
        params = init_fn(self.rng, images)["params"]
        state = TrainState.create(
            apply_fn=self.model.apply, params=params, tx=self.tx,
            lr_scale=jnp.ones([], jnp.float32),
            # Copy, don't alias: the step donates the state, and donating the
            # same underlying buffer twice (params + ema) is an XLA error.
            ema_params=(
                jax.tree_util.tree_map(jnp.copy, params)
                if self.config.ema_decay > 0.0 else None
            ),
        )
        # Strong-typed step: flax's create() seeds step with a python-int 0
        # that becomes a WEAK-typed int32 under jit, while orbax restores it
        # strong — the aval mismatch silently retraced the whole train step
        # once per resume (measured 15 s even on the tiny CI config).
        state = state.replace(step=jnp.zeros((), jnp.int32))
        # Replicate state over the mesh.
        state = jax.device_put(state, replicated(self.mesh))
        self.state = state
        return state

    def train_step(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        assert self.state is not None, "call init_state first"
        batch = shard_batch(self.mesh, batch)
        self.state, metrics = self._train_step(self.state, batch, self.rng)
        return metrics

    # ------------------------------------------------------------------
    def train_epoch(self, loader: Iterable, epoch: int) -> Dict[str, float]:
        """One epoch with periodic stability checks + auto-corrections
        (reference: mhc_trainer.py:141-221,404-420).

        Metrics are pulled to host every step (they are needed for the epoch
        aggregate anyway); the stability check consumes the elementwise MAX
        over the window since the last check, so a one-step spike cannot slip
        between periodic samples.
        """
        agg: Dict[str, float] = {}
        n = 0
        for batch in loader:
            metrics = self.train_step(batch)
            # ONE device_get for the whole dict: each individual float(v)
            # would be a separate blocking transfer (~25 ms behind a tunneled
            # device), turning ~10 metrics into 250 ms/step of pure latency.
            host = {k: float(v) for k, v in jax.device_get(metrics).items()}
            for k in ("grad_norm", "loss", "ds_error_max", "signal_ratio_mean"):
                if k in host and np.isfinite(host[k]):
                    self._window_max[k] = max(self._window_max.get(k, 0.0), host[k])
            step = int(self.state.step)
            self._log_step_metrics(step, host)
            if step % self.config.stability_check_every == 0:
                check = dict(host)
                # Substitute window maxima for the spike-prone scalars.
                for k in ("grad_norm", "ds_error_max", "signal_ratio_mean"):
                    if k in self._window_max:
                        check[k] = self._window_max[k]
                report = self.monitor.check_stability(check, params=self.state.params)
                self._window_max = {}
                if self.manifold_sched is not None:
                    self.manifold_sched.step(check)
                    self._sync_lr_scale()
                if not report["is_stable"]:
                    self._apply_stability_corrections(report)
                elif self._stab_scale < 1.0:
                    # Recover after clean checks — corrections are a brake,
                    # not a ratchet (reference's ManifoldAwareScheduler
                    # recovers at 1.02/step; scheduler.py:306-449).
                    self._stab_scale = min(self._stab_scale * 1.25, 1.0)
                    self._sync_lr_scale()
            if (
                self.config.checkpoint_every_steps
                and step % self.config.checkpoint_every_steps == 0
            ):
                self.save_checkpoint(f"step_{step}")
            n += 1
            for k, v in host.items():
                agg[k] = agg.get(k, 0.0) + v
        return {k: v / max(n, 1) for k, v in agg.items()}

    def _log_step_metrics(self, step: int, host: Dict[str, float]) -> None:
        if self.config.metrics_log is None:
            return
        import json

        if self._metrics_fh is None:
            self._metrics_fh = open(self.config.metrics_log, "a", buffering=1)
        row = {"step": step, "time": time.time(),
               "lr_scale": float(self.state.lr_scale)}
        for k in ("loss", "grad_norm", "detection_loss", "ds_error_max",
                  "signal_ratio_mean", "reg_loss"):
            if k in host:
                row[k] = host[k]
        self._metrics_fh.write(json.dumps(row) + "\n")

    def _sync_lr_scale(self) -> None:
        scale = self._stab_scale
        if self.plateau is not None:
            scale *= self.plateau.scale
        if self.manifold_sched is not None:
            scale *= self.manifold_sched.scale
        # Placement must match the replicated train state: an uncommitted
        # scalar here changes the input sharding signature and forces a full
        # train-step recompile (~minutes) on the next step.
        new_scale = jax.device_put(
            jnp.asarray(max(scale, 1e-3), jnp.float32), replicated(self.mesh)
        )
        self.state = self.state.replace(lr_scale=new_scale)

    def _apply_stability_corrections(self, report: Dict[str, Any]) -> None:
        """Halve the LR multiplier on instability (reference: mhc_trainer.py:404-420;
        the reference also bumps Sinkhorn iterations, which here is a static
        compile-time constant — the LR correction is the load-bearing one)."""
        self._stab_scale = max(self._stab_scale * 0.5, 1e-3)
        self._sync_lr_scale()
        self.monitor.record_correction(float(self.state.lr_scale))

    # ------------------------------------------------------------------
    def train_chunked(
        self,
        data,
        total_steps: int,
        batch_size: int = 16,
        out_sizes: Sequence[int] = (416,),
        batch_sizes: Optional[Dict[int, int]] = None,
        chunk_steps: int = 100,
        aug=None,
        val_data=None,
        val_out_size: Optional[int] = None,
        val_batch_size: int = 8,
        val_every_chunks: int = 10,
        eig_every_chunks: int = 10,
        progress_fn: Optional[Callable[[Dict[str, Any]], None]] = None,
    ) -> Dict[str, Any]:
        """On-device training loop: the dataset is HBM-resident (`DeviceData`),
        batches are sampled+augmented inside a scanned chunk, and the host
        only sees a small stacked-metrics array per chunk.

        Multi-resolution training: one compiled chunk per entry in
        ``out_sizes``, cycled round-robin per chunk — the TPU-shaped
        equivalent of the reference's multi-resolution table
        (reference: PROJECT.md:964-969).

        Stability monitoring runs per chunk on the full per-step series (no
        window-max approximation needed — every step's metrics come back),
        with the same LR-halving corrections as ``train_epoch``.
        """
        from .stability import make_eig_telemetry

        assert self.state is not None, "call init_state first"
        batch_sizes = dict(batch_sizes or {})
        chunks = {}
        for o in out_sizes:
            b = batch_sizes.get(o, batch_size)
            chunks[o] = jax.jit(
                make_train_chunk(
                    self.model, self.config, b, o, chunk_steps, aug=aug
                ),
                donate_argnums=(0,),
            )
        val_chunk = None
        if val_data is not None:
            vo = val_out_size or max(out_sizes)
            n_val_batches = int(val_data.images.shape[0]) // val_batch_size
            val_chunk = jax.jit(
                make_val_chunk(
                    self.model, self.config, val_batch_size, vo, n_val_batches
                )
            )
        eig_fn = make_eig_telemetry(self.config.sk_iters)

        n_chunks = total_steps // chunk_steps
        t_start = time.time()
        last_eig: Dict[str, float] = {}
        for ci in range(n_chunks):
            o = out_sizes[ci % len(out_sizes)]
            rng = jax.random.fold_in(self.rng, ci)
            self.state, stacked = chunks[o](self.state, data, rng)
            host = jax.device_get(stacked)  # ONE pull per chunk
            host = {k: np.asarray(v) for k, v in host.items()}
            step_now = int(self.state.step)
            k = host["loss"].shape[0]
            first_step = step_now - k + 1

            # Per-step JSONL rows (same schema as train_epoch's logging).
            if self.config.metrics_log is not None:
                for i in range(k):
                    row = {kk: float(host[kk][i]) for kk in (
                        "loss", "grad_norm", "detection_loss", "ds_error_max",
                        "signal_ratio_mean",
                    ) if kk in host}
                    self._log_step_metrics(first_step + i, row)

            # Stability check on the chunk: spike-prone scalars use the chunk
            # MAX (exact — full series available), loss uses the chunk mean.
            check = {
                "loss": float(np.nanmean(host["loss"])),
                "grad_norm": float(np.nanmax(host["grad_norm"])),
            }
            for kk in ("ds_error_max", "signal_ratio_mean"):
                if kk in host:
                    check[kk] = float(np.nanmax(host[kk]))
            if not np.all(np.isfinite(host["loss"])):
                check["loss"] = float("nan")
            if eig_every_chunks and ci % eig_every_chunks == 0:
                last_eig = {
                    k2: float(v) for k2, v in
                    jax.device_get(eig_fn(self.state.params)).items()
                }
                check.update(last_eig)
            report = self.monitor.check_stability(check)
            if self.manifold_sched is not None:
                self.manifold_sched.step(check)
                self._sync_lr_scale()
            if not report["is_stable"]:
                self._apply_stability_corrections(report)
            elif self._stab_scale < 1.0:
                self._stab_scale = min(self._stab_scale * 1.25, 1.0)
                self._sync_lr_scale()

            # Validation / best checkpoint / periodic checkpoint.
            val_loss = None
            if val_chunk is not None and (ci + 1) % val_every_chunks == 0:
                val_loss = float(val_chunk(self.eval_params(), val_data))
                self.history["val_loss"].append(val_loss)
                if val_loss < self.best_val_loss:
                    self.best_val_loss = val_loss
                    self.save_checkpoint("best")
            if (
                self.config.checkpoint_every_steps
                and step_now // self.config.checkpoint_every_steps
                > first_step // self.config.checkpoint_every_steps
            ):
                self.save_checkpoint(f"step_{step_now}")
            self.history["train_loss"].append(float(np.nanmean(host["loss"])))

            if progress_fn is not None:
                progress_fn({
                    "chunk": ci, "step": step_now, "out_size": o,
                    "loss": check["loss"],
                    "grad_norm_max": check["grad_norm"],
                    "ds_error_max": check.get("ds_error_max"),
                    "val_loss": val_loss,
                    "lr_scale": float(self.state.lr_scale),
                    "steps_per_sec": step_now / max(time.time() - t_start, 1e-9),
                    **{f"eig_{k2}": v for k2, v in last_eig.items()},
                })
        return {
            "history": self.history,
            "best_val_loss": self.best_val_loss,
            "steps_per_sec": (n_chunks * chunk_steps) / max(time.time() - t_start, 1e-9),
        }

    # ------------------------------------------------------------------
    def eval_params(self, use_ema: bool = True):
        """EMA weights when maintained, else raw params (reference: EMA eval,
        TrainingConfig.ema_decay)."""
        if use_ema and self.state.ema_params is not None:
            return self.state.ema_params
        return self.state.params

    def validate(self, loader: Iterable, use_ema: bool = True) -> Dict[str, float]:
        params = self.eval_params(use_ema)
        agg: Dict[str, float] = {}
        n = 0
        for batch in loader:
            batch = shard_batch(self.mesh, batch)
            metrics = jax.device_get(self._eval_step(params, batch))
            n += 1
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
        return {k: v / max(n, 1) for k, v in agg.items()}

    # ------------------------------------------------------------------
    def train(
        self,
        train_loader_fn: Callable[[], Iterable],
        val_loader_fn: Optional[Callable[[], Iterable]] = None,
        epochs: int = 1,
        resume_from: Optional[str] = None,
    ) -> Dict[str, Any]:
        """Full loop: epochs, validation, early stopping, checkpoints
        (reference: mhc_trainer.py:481-593)."""
        if resume_from:
            self.load_checkpoint(resume_from)
        for epoch in range(epochs):
            t0 = time.time()
            train_metrics = self.train_epoch(train_loader_fn(), epoch)
            self.history["train_loss"].append(train_metrics.get("loss", float("nan")))
            log = {"epoch": epoch, "time_s": time.time() - t0, **train_metrics}
            if val_loader_fn is not None:
                val_metrics = self.validate(val_loader_fn())
                self.history["val_loss"].append(val_metrics["val_loss"])
                log.update(val_metrics)
                if self.plateau is not None:
                    # Reduce-on-plateau drives the LR multiplier
                    # (reference: PlateauSchedulerWithReset, scheduler.py:137-304).
                    self.plateau.step(val_metrics["val_loss"])
                    self._sync_lr_scale()
                if val_metrics["val_loss"] < self.best_val_loss:
                    self.best_val_loss = val_metrics["val_loss"]
                    self.epochs_without_improvement = 0
                    self.save_checkpoint("best")
                else:
                    self.epochs_without_improvement += 1
                if self.epochs_without_improvement >= self.config.early_stopping_patience:
                    break
            if (epoch + 1) % self.config.checkpoint_every_epochs == 0:
                self.save_checkpoint(f"epoch_{epoch + 1}")
        return {"history": self.history, "best_val_loss": self.best_val_loss}

    # ------------------------------------------------------------------
    def save_checkpoint(self, name: str) -> str:
        """Full train state via orbax (reference: mhc_trainer.py:595-626 —
        model+optimizer+step+history in one artifact)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.config.checkpoint_dir, name))
        ckpt = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "lr_scale": self.state.lr_scale,
        }
        if self.state.ema_params is not None:
            ckpt["ema_params"] = self.state.ema_params
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, ckpt, force=True)
        # History saved alongside as JSON (host-side metadata).
        import json

        with open(path + ".history.json", "w") as f:
            json.dump(self.history, f)
        return path

    def load_checkpoint(self, name_or_path: str) -> None:
        """Restore full train state (reference: mhc_trainer.py:628-656)."""
        import orbax.checkpoint as ocp

        path = name_or_path
        if not os.path.isabs(path):
            path = os.path.abspath(os.path.join(self.config.checkpoint_dir, path))
        assert self.state is not None, "init_state before load_checkpoint"
        template = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "lr_scale": self.state.lr_scale,
        }
        if self.state.ema_params is not None:
            template["ema_params"] = self.state.ema_params
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(path, item=template)
        # Re-put restored arrays to the LIVE state's shardings. Orbax restores
        # with sharding info read from the checkpoint files; if that differs
        # from the current mesh placement (different topology, or the
        # file-derived default), the next train_step would silently compile a
        # SECOND program specialized to the restored shardings (measured:
        # +37 s on the tiny CI config; doubles HBM held by params on a real
        # resume). Same trap the engine guards against for serving
        # (engine.load_checkpoint).
        import jax

        restored = jax.tree_util.tree_map(
            lambda live, res: jax.device_put(res, live.sharding)
            if hasattr(live, "sharding") else res,
            template,
            {k: restored.get(k, template[k]) for k in template},
        )
        self.state = self.state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            lr_scale=restored["lr_scale"],
            ema_params=restored.get("ema_params", self.state.ema_params),
        )
        hist_path = path + ".history.json"
        if os.path.exists(hist_path):
            import json

            with open(hist_path) as f:
                self.history = json.load(f)
