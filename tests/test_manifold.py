"""Tests for manifold projectors/retractions (reference src/utils/manifold_ops.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvs_tpu.ops import (
    birkhoff_project,
    birkhoff_tangent_project,
    stiefel_project,
    stiefel_tangent_project,
    stiefel_retract_cayley,
    spd_project,
    spd_retract_expm,
    spd_distance,
    riemannian_gradient,
    manifold_regularization,
    check_manifold_constraints,
)


def test_birkhoff_project():
    raw = jax.random.normal(jax.random.PRNGKey(0), (8, 8))
    p = birkhoff_project(raw, n_iters=30)
    chk = check_manifold_constraints(p, "birkhoff", tol=5e-3)
    assert bool(chk["satisfied"])


def test_birkhoff_tangent():
    v = jax.random.normal(jax.random.PRNGKey(1), (8, 8))
    p = birkhoff_project(jax.random.normal(jax.random.PRNGKey(2), (8, 8)))
    t = birkhoff_tangent_project(p, v)
    np.testing.assert_allclose(np.asarray(jnp.sum(t, axis=-1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.sum(t, axis=-2)), 0.0, atol=1e-5)
    # Idempotent.
    t2 = birkhoff_tangent_project(p, t)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-5)


def test_stiefel_project_orthonormal():
    m = jax.random.normal(jax.random.PRNGKey(3), (16, 8))
    q = stiefel_project(m)
    gram = np.asarray(q.T @ q)
    np.testing.assert_allclose(gram, np.eye(8), atol=1e-5)
    assert bool(check_manifold_constraints(q, "stiefel", tol=1e-4)["satisfied"])


def test_stiefel_retraction_stays_on_manifold():
    x = stiefel_project(jax.random.normal(jax.random.PRNGKey(4), (16, 8)))
    v = stiefel_tangent_project(x, jax.random.normal(jax.random.PRNGKey(5), (16, 8)))
    y = stiefel_retract_cayley(x, v, step=0.1)
    gram = np.asarray(y.T @ y)
    np.testing.assert_allclose(gram, np.eye(8), atol=1e-4)


def test_spd_project():
    m = jax.random.normal(jax.random.PRNGKey(6), (8, 8))
    p = spd_project(m)
    w = np.linalg.eigvalsh(np.asarray(p))
    assert np.all(w > 0)
    assert bool(check_manifold_constraints(p, "spd", tol=1e-4)["satisfied"])


def test_spd_retraction_and_distance():
    m = jax.random.normal(jax.random.PRNGKey(7), (6, 6))
    p = spd_project(m @ m.T + 0.5 * jnp.eye(6))
    v = jax.random.normal(jax.random.PRNGKey(8), (6, 6))
    v = 0.5 * (v + v.T)
    q = spd_retract_expm(p, v, step=0.1)
    w = np.linalg.eigvalsh(np.asarray(q))
    assert np.all(w > 0)
    assert float(spd_distance(p, p)) < 1e-4
    assert float(spd_distance(p, q)) > 0


@pytest.mark.parametrize("manifold", ["birkhoff", "stiefel", "spd"])
def test_regularization_and_riemannian_grad(manifold):
    m = jax.random.normal(jax.random.PRNGKey(9), (8, 8))
    reg = manifold_regularization(m, manifold)
    assert float(reg) >= 0
    if manifold == "birkhoff":
        point = birkhoff_project(m)
    elif manifold == "stiefel":
        point = stiefel_project(m)
    else:
        point = spd_project(m)
    g = riemannian_gradient(point, jax.random.normal(jax.random.PRNGKey(10), (8, 8)), manifold)
    assert g.shape == (8, 8)
    assert bool(jnp.all(jnp.isfinite(g)))
