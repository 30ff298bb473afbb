"""Manifold-aware optimization as composable optax transforms.

TPU-native redesign of the reference's hand-rolled optimizer
(reference: src/training/optimizer.py:31-393). The reference implements AdamW
and SGD update rules by hand in Python per-parameter loops; here the same
policy is expressed as an ``optax.multi_transform`` partition:

  * regular params  -> AdamW + global-norm clip 1.0
  * mHC params (path contains ``H_pre_raw``/``H_post_raw``/``H_res_raw`` or an
    ``mhc`` scope) -> SGD at 0.5x LR with momentum, tangent-space gradient
    preconditioning for square matrices, and a tighter 0.5 clip
    (reference: optimizer.py:229-266; differential clipping
    mhc_trainer.py:342-383)
  * periodic hard Sinkhorn re-projection of every ``H_res_raw`` every
    ``project_every`` steps (reference: optimizer.py:258-266), implemented as a
    stateful optax transform so it lives inside the jitted update.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..ops.manifold import birkhoff_tangent_project
from ..ops.sinkhorn import sinkhorn_log


MHC_PARAM_NAMES = ("H_pre_raw", "H_post_raw", "H_res_raw")


def is_mhc_path(path) -> bool:
    """Mirror the reference's name test ``'mhc' in name or 'H_' in name``
    (reference: src/training/mhc_trainer.py:360-366)."""
    keys = [str(getattr(p, "key", p)) for p in path]
    return any(k in MHC_PARAM_NAMES or k.startswith("mhc") for k in keys)


def mhc_partition(params) -> Any:
    """Label tree: 'mhc' vs 'regular' for optax.multi_transform."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "mhc" if is_mhc_path(path) else "regular", params
    )


def tangent_precondition() -> optax.GradientTransformation:
    """Project gradients of square mHC matrices onto the Birkhoff tangent space
    (reference: src/training/optimizer.py:229-256 gradient preconditioning)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def proj(path, g):
            keys = [str(getattr(p, "key", p)) for p in path]
            if keys and keys[-1] == "H_res_raw" and g.ndim == 2 and g.shape[0] == g.shape[1]:
                return birkhoff_tangent_project(g, g)
            return g

        return jax.tree_util.tree_map_with_path(proj, updates), state

    return optax.GradientTransformation(init, update)


class ProjectionState(NamedTuple):
    step: jnp.ndarray


def periodic_sinkhorn_projection(
    every: int = 100, sk_iters: int = 20
) -> optax.GradientTransformation:
    """Every ``every`` steps, replace the H_res_raw *update* so that the new
    parameter lands near log(Sinkhorn(param)) — a hard re-projection expressed
    through the update rule (reference: src/training/optimizer.py:258-266).

    We compute the projected matrix P = Sinkhorn(param + update) and emit
    update' = log(P + eps) - param, so param' = log(P + eps); since
    Sinkhorn(log P) == P for a doubly stochastic P, the constrained matrix seen
    by the forward pass is exactly the projection.
    """

    def init(params):
        del params
        return ProjectionState(step=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        assert params is not None, "periodic_sinkhorn_projection needs params"
        do_proj = (state.step + 1) % every == 0

        def proj(path, u, p):
            keys = [str(getattr(q, "key", q)) for q in path]
            if not (keys and keys[-1] == "H_res_raw" and u.ndim == 2
                    and u.shape[0] == u.shape[1]):
                return u
            proposed = p + u
            projected = sinkhorn_log(proposed.astype(jnp.float32), n_iters=sk_iters)
            hard_u = jnp.log(projected + 1e-9) - p
            return jnp.where(do_proj, hard_u.astype(u.dtype), u)

        new_updates = jax.tree_util.tree_map_with_path(proj, updates, params)
        return new_updates, ProjectionState(step=state.step + 1)

    return optax.GradientTransformation(init, update)


def is_backbone_path(path) -> bool:
    keys = [str(getattr(p, "key", p)) for p in path]
    return bool(keys) and keys[0] == "backbone"


def make_optimizer(
    learning_rate: optax.Schedule | float,
    weight_decay: float = 0.01,
    mhc_lr_factor: float = 0.5,
    clip_regular: float = 1.0,
    clip_mhc: float = 0.5,
    b1: float = 0.9,
    b2: float = 0.999,
    project_every: int = 100,
    sk_iters: int = 20,
    use_projection: bool = True,
    backbone_lr_factor: float = 1.0,
) -> optax.GradientTransformation:
    """The ManifoldAwareOptimizer as an optax chain
    (reference: src/training/optimizer.py:31-266). ``backbone_lr_factor``
    implements the reference's per-group LR (backbone 0.1x,
    training_config.py:~750-770) as a third partition."""

    def scaled(factor):
        if callable(learning_rate):
            return lambda step: learning_rate(step) * factor
        return learning_rate * factor

    def adamw_chain(lr):
        return optax.chain(
            optax.clip_by_global_norm(clip_regular),
            optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay),
        )

    def mhc_chain_for(lr):
        chain = [
            optax.clip_by_global_norm(clip_mhc),
            tangent_precondition(),
            optax.sgd(lr, momentum=0.9),
        ]
        if use_projection:
            chain.append(periodic_sinkhorn_projection(project_every, sk_iters))
        return optax.chain(*chain)

    transforms = {
        "regular": adamw_chain(scaled(1.0)),
        "mhc": mhc_chain_for(scaled(mhc_lr_factor)),
    }

    def partition(params):
        def label(path, _):
            if is_mhc_path(path):
                if backbone_lr_factor != 1.0 and is_backbone_path(path):
                    return "mhc_backbone"
                return "mhc"
            if backbone_lr_factor != 1.0 and is_backbone_path(path):
                return "backbone"
            return "regular"

        return jax.tree_util.tree_map_with_path(label, params)

    if backbone_lr_factor != 1.0:
        transforms["backbone"] = adamw_chain(scaled(backbone_lr_factor))
        transforms["mhc_backbone"] = mhc_chain_for(
            scaled(mhc_lr_factor * backbone_lr_factor)
        )

    return optax.multi_transform(transforms, partition)


def ema_transform(decay: float) -> optax.GradientTransformation:
    """Exponential moving average of parameters, kept in optimizer state
    (reference: TrainingConfig.ema_decay). Retrieve with :func:`get_ema_params`."""
    return optax.ema(decay, debias=True)


class EMAState(NamedTuple):
    ema: Any
    count: jnp.ndarray


def make_param_ema(decay: float):
    """Standalone parameter EMA tracker: (init, update) pure functions."""

    def init(params):
        return EMAState(
            ema=jax.tree_util.tree_map(jnp.asarray, params),
            count=jnp.zeros([], jnp.int32),
        )

    def update(state: EMAState, params) -> EMAState:
        new_ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.ema, params
        )
        return EMAState(ema=new_ema, count=state.count + 1)

    return init, update


def doubly_stochastic_projection(
    matrix: jax.Array, method: str = "sinkhorn", n_iters: int = 20
) -> jax.Array:
    """Standalone projection operator (reference: DoublyStochasticProjection,
    src/training/optimizer.py:277-393) with sinkhorn/softmax/exponential methods."""
    m = matrix.astype(jnp.float32)
    if method == "sinkhorn":
        return sinkhorn_log(m, n_iters=n_iters)
    if method == "softmax":
        # Row-softmax then column-balance a few iterations.
        p = jax.nn.softmax(m, axis=-1)
        for _ in range(3):
            p = p / (jnp.sum(p, axis=-2, keepdims=True) + 1e-9)
            p = p / (jnp.sum(p, axis=-1, keepdims=True) + 1e-9)
        return p
    if method == "exponential":
        p = jnp.exp(m - jnp.max(m))
        return sinkhorn_log(jnp.log(p + 1e-9), n_iters=n_iters)
    raise ValueError(f"unknown projection method: {method!r}")
