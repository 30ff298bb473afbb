"""Matrix-manifold projections, retractions, and Riemannian gradient utilities.

TPU-native equivalent of the reference's manifold toolbox
(reference: src/utils/manifold_ops.py:1-610): Birkhoff polytope, Stiefel manifold,
and SPD cone projectors; tangent-space projections for Riemannian gradients; a
constraint checker; and a manifold regularization loss. Everything is a pure
function of arrays — usable inside jit/grad — instead of the reference's stateful
projector classes.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .sinkhorn import sinkhorn_log, doubly_stochastic_error

# ---------------------------------------------------------------------------
# Birkhoff polytope (doubly stochastic matrices)
# ---------------------------------------------------------------------------


def birkhoff_project(matrix: jax.Array, n_iters: int = 20, tau: float = 1.0) -> jax.Array:
    """Project onto the Birkhoff polytope via log-domain Sinkhorn
    (reference: src/utils/manifold_ops.py BirkhoffProjector)."""
    return sinkhorn_log(matrix, n_iters=n_iters, tau=tau)


def birkhoff_tangent_project(point: jax.Array, vector: jax.Array) -> jax.Array:
    """Project ``vector`` onto the tangent space of the Birkhoff polytope at ``point``.

    The tangent space of doubly stochastic matrices is {V : V @ 1 = 0, V^T @ 1 = 0};
    the closed-form orthogonal projection subtracts row and column means and adds
    back the grand mean.
    """
    row_mean = jnp.mean(vector, axis=-1, keepdims=True)
    col_mean = jnp.mean(vector, axis=-2, keepdims=True)
    grand_mean = jnp.mean(vector, axis=(-1, -2), keepdims=True)
    return vector - row_mean - col_mean + grand_mean


# ---------------------------------------------------------------------------
# Stiefel manifold (orthonormal frames)
# ---------------------------------------------------------------------------


def stiefel_project(matrix: jax.Array) -> jax.Array:
    """Project to the Stiefel manifold via QR with sign-fixed diagonal
    (reference: src/utils/manifold_ops.py StiefelProjector.project)."""
    q, r = jnp.linalg.qr(matrix)
    # Fix signs so the decomposition is unique (diag(R) > 0).
    d = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
    d = jnp.where(d == 0, 1.0, d)
    return q * d[..., None, :]


def stiefel_tangent_project(point: jax.Array, vector: jax.Array) -> jax.Array:
    """Tangent projection at X: V - X sym(X^T V) (canonical metric)."""
    xtv = jnp.swapaxes(point, -1, -2) @ vector
    sym = 0.5 * (xtv + jnp.swapaxes(xtv, -1, -2))
    return vector - point @ sym


def stiefel_retract_cayley(point: jax.Array, tangent: jax.Array, step: float = 1.0) -> jax.Array:
    """Cayley retraction on the Stiefel manifold
    (reference: src/utils/manifold_ops.py StiefelProjector.retract).

    Uses W = A X^T - X A^T (skew) and X_new = (I - t/2 W)^{-1} (I + t/2 W) X.
    """
    a = tangent
    x = point
    w = a @ jnp.swapaxes(x, -1, -2) - x @ jnp.swapaxes(a, -1, -2)
    n = x.shape[-2]
    eye = jnp.eye(n, dtype=x.dtype)
    lhs = eye - (step / 2.0) * w
    rhs = (eye + (step / 2.0) * w) @ x
    return jnp.linalg.solve(lhs, rhs)


def stiefel_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    """Geodesic-style distance via principal angles: ||arccos(svd(X^T Y))||."""
    s = jnp.linalg.svd(jnp.swapaxes(x, -1, -2) @ y, compute_uv=False)
    s = jnp.clip(s, -1.0, 1.0)
    return jnp.linalg.norm(jnp.arccos(s), axis=-1)


# ---------------------------------------------------------------------------
# SPD cone (symmetric positive definite matrices)
# ---------------------------------------------------------------------------


def spd_project(matrix: jax.Array, min_eig: float = 1e-6) -> jax.Array:
    """Project to the SPD cone: symmetrize then clip eigenvalues
    (reference: src/utils/manifold_ops.py SPDProjector.project)."""
    sym = 0.5 * (matrix + jnp.swapaxes(matrix, -1, -2))
    w, v = jnp.linalg.eigh(sym)
    w = jnp.maximum(w, min_eig)
    return (v * w[..., None, :]) @ jnp.swapaxes(v, -1, -2)


def spd_retract_expm(point: jax.Array, tangent: jax.Array, step: float = 1.0) -> jax.Array:
    """Exponential-map retraction: P^{1/2} expm(t P^{-1/2} V P^{-1/2}) P^{1/2}.

    Eigenvalues of P are floored relative to its largest eigenvalue and the inner
    exponent is clipped to ±50 so ill-conditioned points cannot overflow to inf.
    """
    w, u = jnp.linalg.eigh(point)
    w_floor = jnp.maximum(1e-6 * jnp.max(w, axis=-1, keepdims=True), 1e-12)
    w = jnp.maximum(w, w_floor)
    sqrt_p = (u * jnp.sqrt(w)[..., None, :]) @ jnp.swapaxes(u, -1, -2)
    inv_sqrt_p = (u * (1.0 / jnp.sqrt(w))[..., None, :]) @ jnp.swapaxes(u, -1, -2)
    inner = inv_sqrt_p @ (step * tangent) @ inv_sqrt_p
    inner = 0.5 * (inner + jnp.swapaxes(inner, -1, -2))
    wi, ui = jnp.linalg.eigh(inner)
    expm = (ui * jnp.exp(jnp.clip(wi, -50.0, 50.0))[..., None, :]) @ jnp.swapaxes(ui, -1, -2)
    return sqrt_p @ expm @ sqrt_p


def spd_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    """Affine-invariant distance: ||logm(X^{-1/2} Y X^{-1/2})||_F."""
    w, u = jnp.linalg.eigh(x)
    w = jnp.maximum(w, 1e-12)
    inv_sqrt_x = (u * (1.0 / jnp.sqrt(w))[..., None, :]) @ jnp.swapaxes(u, -1, -2)
    m = inv_sqrt_x @ y @ inv_sqrt_x
    m = 0.5 * (m + jnp.swapaxes(m, -1, -2))
    wm = jnp.linalg.eigvalsh(m)
    wm = jnp.maximum(wm, 1e-12)
    return jnp.linalg.norm(jnp.log(wm), axis=-1)


# ---------------------------------------------------------------------------
# Riemannian gradients & regularization
# ---------------------------------------------------------------------------


def riemannian_gradient(
    point: jax.Array, euclidean_grad: jax.Array, manifold: str = "birkhoff"
) -> jax.Array:
    """Convert a Euclidean gradient to a Riemannian one by tangent projection
    (reference: src/utils/manifold_ops.py:130-157)."""
    if manifold == "birkhoff":
        return birkhoff_tangent_project(point, euclidean_grad)
    if manifold == "stiefel":
        return stiefel_tangent_project(point, euclidean_grad)
    if manifold == "spd":
        # Riemannian grad on SPD (affine-invariant): P sym(G) P
        sym = 0.5 * (euclidean_grad + jnp.swapaxes(euclidean_grad, -1, -2))
        return point @ sym @ point
    raise ValueError(f"unknown manifold: {manifold!r}")


def manifold_regularization(
    matrix: jax.Array, manifold: str = "birkhoff", weight: float = 1.0
) -> jax.Array:
    """Penalty measuring distance from the constraint set
    (reference: src/utils/manifold_ops.py:509-543)."""
    m = matrix.astype(jnp.float32)
    if manifold == "birkhoff":
        row = jnp.mean((jnp.sum(m, axis=-1) - 1.0) ** 2)
        col = jnp.mean((jnp.sum(m, axis=-2) - 1.0) ** 2)
        neg = jnp.mean(jax.nn.relu(-m) ** 2)
        return weight * (row + col + neg)
    if manifold == "stiefel":
        gram = jnp.swapaxes(m, -1, -2) @ m
        eye = jnp.eye(gram.shape[-1], dtype=gram.dtype)
        return weight * jnp.mean((gram - eye) ** 2)
    if manifold == "spd":
        asym = m - jnp.swapaxes(m, -1, -2)
        w = jnp.linalg.eigvalsh(0.5 * (m + jnp.swapaxes(m, -1, -2)))
        return weight * (jnp.mean(asym**2) + jnp.mean(jax.nn.relu(-w) ** 2))
    raise ValueError(f"unknown manifold: {manifold!r}")


def check_manifold_constraints(
    matrix: jax.Array, manifold: str = "birkhoff", tol: float = 1e-3
) -> Dict[str, jax.Array]:
    """Constraint-satisfaction report (reference: src/utils/manifold_ops.py:546-610).

    Returns a dict of scalar arrays (jit-friendly); ``satisfied`` is a bool array.
    """
    m = matrix.astype(jnp.float32)
    if manifold == "birkhoff":
        err = doubly_stochastic_error(m)
        max_err = jnp.max(err)
        return {
            "max_violation": max_err,
            "satisfied": max_err <= tol,
            "row_sum_error": jnp.max(jnp.abs(jnp.sum(m, axis=-1) - 1.0)),
            "col_sum_error": jnp.max(jnp.abs(jnp.sum(m, axis=-2) - 1.0)),
            "negativity": jnp.max(jax.nn.relu(-m)),
        }
    if manifold == "stiefel":
        # Force fp32 matmul: TPU default (bf16 passes) would report false violations.
        gram = jnp.matmul(jnp.swapaxes(m, -1, -2), m, precision=jax.lax.Precision.HIGHEST)
        eye = jnp.eye(gram.shape[-1], dtype=gram.dtype)
        viol = jnp.max(jnp.abs(gram - eye))
        return {"max_violation": viol, "satisfied": viol <= tol}
    if manifold == "spd":
        asym = jnp.max(jnp.abs(m - jnp.swapaxes(m, -1, -2)))
        min_eig = jnp.min(jnp.linalg.eigvalsh(0.5 * (m + jnp.swapaxes(m, -1, -2))))
        viol = jnp.maximum(asym, jax.nn.relu(-min_eig))
        return {
            "max_violation": viol,
            "satisfied": viol <= tol,
            "min_eigenvalue": min_eig,
        }
    raise ValueError(f"unknown manifold: {manifold!r}")
