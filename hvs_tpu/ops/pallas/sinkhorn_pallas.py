"""Fused log-domain Sinkhorn as a single Pallas TPU kernel.

The whole 20-iteration projection runs inside one kernel with the matrix
resident in VMEM — one HBM read, one HBM write, zero per-iteration kernel
overhead (the north-star fusion named in BASELINE.json; replaces the
reference's 20-iteration Python loop, src/models/manifold_layers.py:64-77).

Math identical to :func:`hvs_tpu.ops.sinkhorn.sinkhorn_log` (fp32 potentials,
final row update => exact row sums). Falls back to the XLA version for shapes
that do not fit VMEM comfortably.

Measured on TPU v5e (512x512, 20 iters): numerically exact vs XLA (1.2e-7 max
diff) but 754us vs XLA's 31us — XLA's loop scheduling beats this kernel, so the
XLA path stays the production default and this kernel is an exactness-tested
alternative. (The serve path doesn't run Sinkhorn at all: constraints are
precomputed at load.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..sinkhorn import sinkhorn_log as _sinkhorn_log_xla

# VMEM budget: keep matrices <= 1024x1024 fp32 (4 MB) in the fused kernel.
_MAX_FUSED_DIM = 1024


def _logsumexp_rows(x):
    """Stable logsumexp along the last axis, keepdims — kernel-local helper."""
    m = jnp.max(x, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True))


def _logsumexp_cols(x):
    m = jnp.max(x, axis=-2, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=-2, keepdims=True))


def _sinkhorn_kernel(logits_ref, out_ref, *, n_iters: float, inv_tau: float):
    x = logits_ref[:].astype(jnp.float32) * inv_tau
    n, m = x.shape
    f = jnp.zeros((n, 1), jnp.float32)
    g = jnp.zeros((1, m), jnp.float32)

    def body(_, fg):
        f, g = fg
        f = -_logsumexp_rows(x + g)
        g = -_logsumexp_cols(x + f)
        return f, g

    f, g = lax.fori_loop(0, n_iters, body, (f, g))
    f = -_logsumexp_rows(x + g)  # exact row sums
    out_ref[:] = jnp.exp(x + f + g).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_iters", "tau"))
def sinkhorn_log_pallas(logits: jax.Array, n_iters: int = 20, tau: float = 1.0
                        ) -> jax.Array:
    """Doubly stochastic projection, fused in VMEM. ``logits``: [n, n]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() == "cpu"  # CPU tests run interpreted

    if logits.ndim != 2 or max(logits.shape) > _MAX_FUSED_DIM:
        return _sinkhorn_log_xla(logits, n_iters=n_iters, tau=tau)

    kernel = functools.partial(
        _sinkhorn_kernel, n_iters=n_iters, inv_tau=1.0 / tau
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(logits.shape, logits.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(logits)
