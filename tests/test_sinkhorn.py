"""Property tests for the Sinkhorn projection (behavioral spec from
reference src/tests/test_models.py:33-100: doubly stochastic output,
differentiability, determinism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvs_tpu.ops import (
    sinkhorn_log,
    sinkhorn_knopp,
    doubly_stochastic_error,
    sinkhorn_regularization_loss,
    sinkhorn_with_diagnostics,
    project_to_doubly_stochastic,
)


@pytest.mark.parametrize("method", ["log", "multiplicative"])
@pytest.mark.parametrize("n", [4, 16, 64])
def test_output_is_doubly_stochastic(method, n):
    key = jax.random.PRNGKey(n)
    raw = jax.random.normal(key, (n, n)) * 2.0
    p = project_to_doubly_stochastic(raw, n_iters=30, method=method)
    p = np.asarray(p, dtype=np.float64)
    assert np.all(p >= -1e-6), "entries must be non-negative"
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-3)
    np.testing.assert_allclose(p.sum(axis=0), 1.0, atol=1e-3)


def test_batched_shapes():
    raw = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 8))
    p = sinkhorn_log(raw)
    assert p.shape == (3, 8, 8)
    err = doubly_stochastic_error(p)
    assert err.shape == (3,)
    assert float(jnp.max(err)) < 1e-2


def test_differentiable():
    """Gradients flow through the unrolled iteration (reference test_models.py:58-83)."""
    raw = jax.random.normal(jax.random.PRNGKey(1), (8, 8))

    def loss(m):
        return jnp.sum(sinkhorn_log(m, n_iters=10) ** 2)

    g = jax.grad(loss)(raw)
    assert g.shape == raw.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.linalg.norm(g)) > 0


def test_deterministic():
    raw = jax.random.normal(jax.random.PRNGKey(2), (16, 16))
    p1 = jax.jit(sinkhorn_log)(raw)
    p2 = jax.jit(sinkhorn_log)(raw)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_bf16_input_keeps_ds_property():
    """fp32 internal accumulation must survive bf16 inputs (SURVEY §7 hard part c)."""
    raw = jax.random.normal(jax.random.PRNGKey(3), (32, 32)).astype(jnp.bfloat16)
    p = sinkhorn_log(raw, n_iters=30)
    assert p.dtype == jnp.bfloat16
    p64 = np.asarray(p, dtype=np.float64)
    np.testing.assert_allclose(p64.sum(axis=1), 1.0, atol=2e-2)
    np.testing.assert_allclose(p64.sum(axis=0), 1.0, atol=2e-2)


def test_identity_like_input_converges_fast():
    p = sinkhorn_log(10.0 * jnp.eye(8), n_iters=5)
    np.testing.assert_allclose(np.asarray(p), np.eye(8), atol=1e-2)


def test_regularization_loss_zero_on_ds_matrix():
    ds = jnp.ones((8, 8)) / 8.0
    assert float(sinkhorn_regularization_loss(ds)) < 1e-10
    raw = jax.random.normal(jax.random.PRNGKey(4), (8, 8)) * 3
    assert float(sinkhorn_regularization_loss(raw)) > 0.1


def test_diagnostics():
    raw = jax.random.normal(jax.random.PRNGKey(5), (16, 16))
    p, diag = sinkhorn_with_diagnostics(raw)
    assert float(diag["row_sum_error"]) < 1e-3
    assert float(diag["min_entry"]) >= 0.0


def test_temperature_sharpens():
    """Lower tau concentrates mass (closer to a permutation)."""
    raw = jax.random.normal(jax.random.PRNGKey(6), (8, 8))
    p_warm = sinkhorn_log(raw, tau=1.0, n_iters=50)
    p_cold = sinkhorn_log(raw, tau=0.1, n_iters=50)
    assert float(jnp.max(p_cold)) > float(jnp.max(p_warm))
