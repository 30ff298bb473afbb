"""Sinkhorn-Knopp projection onto the Birkhoff polytope (doubly stochastic matrices).

TPU-native redesign of the reference's three divergent Sinkhorn implementations
(reference: src/utils/sinkhorn.py:27-381, src/models/manifold_layers.py:10-101).
We keep ONE numerically-sound algorithm — the log-domain formulation
(reference: src/utils/sinkhorn.py:323-372) — expressed as a ``lax.fori_loop`` so it
fuses into the surrounding jitted computation, plus a multiplicative variant kept
for behavioral parity with the module-form projection
(reference: src/models/manifold_layers.py:55-77).

All iterations run in float32 regardless of the ambient activation dtype (bf16):
the doubly-stochastic property must hold to ~1e-4, which bf16 cannot represent.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import logsumexp


def sinkhorn_log(
    logits: jax.Array,
    n_iters: int = 20,
    tau: float = 1.0,
) -> jax.Array:
    """Project ``logits`` to a doubly stochastic matrix via log-domain Sinkhorn.

    Iterates row/column potentials f, g with log-sum-exp updates:
        f_i <- -logsumexp_j(L_ij + g_j)
        g_j <- -logsumexp_i(L_ij + f_i)
    and returns ``exp(L + f[:, None] + g[None, :])``. A final row update is applied
    after the loop so row sums are exact to float32 precision; column sums converge
    geometrically with ``n_iters``.

    Args:
        logits: ``[..., n, n]`` unconstrained matrix (any float dtype).
        n_iters: number of alternating updates (reference default 20,
            src/config/model_config.py MHCConfig.sk_iterations).
        tau: temperature; smaller = closer to a permutation matrix.

    Returns:
        ``[..., n, n]`` doubly stochastic matrix in the input dtype.
    """
    in_dtype = logits.dtype
    x = logits.astype(jnp.float32) / tau
    n = x.shape[-1]
    batch_shape = x.shape[:-2]
    f = jnp.zeros(batch_shape + (n,), jnp.float32)
    g = jnp.zeros(batch_shape + (n,), jnp.float32)

    def body(_, fg):
        f, g = fg
        f = -logsumexp(x + g[..., None, :], axis=-1)
        g = -logsumexp(x + f[..., :, None], axis=-2)
        return f, g

    f, g = lax.fori_loop(0, n_iters, body, (f, g))
    # Final row normalization => exact row sums; columns are within O(convergence).
    f = -logsumexp(x + g[..., None, :], axis=-1)
    p = jnp.exp(x + f[..., :, None] + g[..., None, :])
    return p.astype(in_dtype)


def sinkhorn_knopp(
    matrix: jax.Array,
    n_iters: int = 20,
    tau: float = 1.0,
    eps: float = 1e-8,
) -> jax.Array:
    """Multiplicative Sinkhorn-Knopp with softmax positivity initialization.

    Behavioral parity with the reference's module-form projection
    (src/models/manifold_layers.py:55-77): ``softmax(M / tau) * n`` then
    alternating row/column divisions. Provided for parity tests; production code
    paths use :func:`sinkhorn_log`.
    """
    in_dtype = matrix.dtype
    x = matrix.astype(jnp.float32) / tau
    n = x.shape[-1]
    p = jax.nn.softmax(x, axis=-1) * n

    def body(_, p):
        p = p / (jnp.sum(p, axis=-1, keepdims=True) + eps)
        p = p / (jnp.sum(p, axis=-2, keepdims=True) + eps)
        return p

    p = lax.fori_loop(0, n_iters, body, p)
    return p.astype(in_dtype)


def project_to_doubly_stochastic(
    matrix: jax.Array,
    n_iters: int = 20,
    tau: float = 1.0,
    method: str = "log",
) -> jax.Array:
    """Convenience dispatcher (reference: src/utils/sinkhorn.py:430-451)."""
    if method == "log":
        return sinkhorn_log(matrix, n_iters=n_iters, tau=tau)
    if method == "multiplicative":
        return sinkhorn_knopp(matrix, n_iters=n_iters, tau=tau)
    raise ValueError(f"unknown sinkhorn method: {method!r}")


def doubly_stochastic_error(matrix: jax.Array) -> jax.Array:
    """Max absolute deviation of row/col sums from 1 plus negativity.

    Used by convergence polling and constraint checks
    (reference: src/utils/sinkhorn.py:191-255, src/training/mhc_trainer.py:385-402).
    Returns a scalar per batch element (``[...]`` shape).
    """
    m = matrix.astype(jnp.float32)
    row_err = jnp.max(jnp.abs(jnp.sum(m, axis=-1) - 1.0), axis=-1)
    col_err = jnp.max(jnp.abs(jnp.sum(m, axis=-2) - 1.0), axis=-1)
    neg_err = jnp.max(jnp.maximum(-m, 0.0), axis=(-1, -2))
    return jnp.maximum(jnp.maximum(row_err, col_err), neg_err)


def sinkhorn_regularization_loss(
    raw_matrix: jax.Array,
    n_iters: int = 20,
    target_weight: float = 1.0,
    negativity_weight: float = 1.0,
) -> jax.Array:
    """Soft doubly-stochastic penalty on an *unconstrained* matrix.

    MSE of row/col sums to 1 plus a ReLU negativity term
    (reference: src/utils/sinkhorn.py:384-426). Applied to raw parameters so the
    optimizer is pulled toward the Birkhoff polytope even between hard projections.
    """
    m = raw_matrix.astype(jnp.float32)
    row_loss = jnp.mean((jnp.sum(m, axis=-1) - 1.0) ** 2)
    col_loss = jnp.mean((jnp.sum(m, axis=-2) - 1.0) ** 2)
    neg_loss = jnp.mean(jax.nn.relu(-m) ** 2)
    return target_weight * (row_loss + col_loss) + negativity_weight * neg_loss


@functools.partial(jax.jit, static_argnames=("n_iters", "tau"))
def sinkhorn_with_diagnostics(
    logits: jax.Array, n_iters: int = 20, tau: float = 1.0
) -> Tuple[jax.Array, dict]:
    """Sinkhorn projection + convergence diagnostics for monitoring.

    Replaces the reference's convergence-history buffers
    (src/models/manifold_layers.py:30,78-81) with a functionally-returned metrics
    dict — no mutable state under jit.
    """
    p = sinkhorn_log(logits, n_iters=n_iters, tau=tau)
    err = doubly_stochastic_error(p)
    diag = {
        "ds_error": err,
        "row_sum_error": jnp.max(jnp.abs(jnp.sum(p, axis=-1) - 1.0)),
        "col_sum_error": jnp.max(jnp.abs(jnp.sum(p, axis=-2) - 1.0)),
        "min_entry": jnp.min(p),
    }
    return p, diag
