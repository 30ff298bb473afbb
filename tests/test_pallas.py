"""Pallas kernel parity tests (interpret mode on CPU; same math as XLA paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvs_tpu.ops import sinkhorn_log, doubly_stochastic_error
from hvs_tpu.ops.pallas import (
    mhc_block_pallas,
    mhc_pallas_supported,
    sinkhorn_log_pallas,
)


def test_sinkhorn_pallas_matches_xla():
    raw = jax.random.normal(jax.random.PRNGKey(0), (128, 128))
    p_ref = sinkhorn_log(raw, n_iters=20)
    p_pal = sinkhorn_log_pallas(raw, n_iters=20)
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_ref), atol=1e-5)
    assert float(doubly_stochastic_error(p_pal)) < 1e-3


def test_sinkhorn_pallas_large_falls_back():
    raw = jax.random.normal(jax.random.PRNGKey(1), (2048, 2048))
    p = sinkhorn_log_pallas(raw, n_iters=5)
    assert p.shape == (2048, 2048)


def test_mhc_pallas_supported_predicate():
    assert mhc_pallas_supported(128, 1, 1)
    assert mhc_pallas_supported(512, 1, 1)
    assert not mhc_pallas_supported(96, 1, 1)
    assert not mhc_pallas_supported(1024, 1, 1)
    assert not mhc_pallas_supported(256, 2, 1)


def _mhc_reference(x, h_pre, w1, b1, w2, b2, h_post, h_res, l1s, l1b, l2s, l2b):
    """Plain-jnp reference of the fused block (bf16 matmuls, fp32 norms)."""

    def ln(v, s, b):
        v32 = v.astype(jnp.float32)
        mu = jnp.mean(v32, -1, keepdims=True)
        var = jnp.mean(jnp.square(v32 - mu), -1, keepdims=True)
        return (v32 - mu) * jax.lax.rsqrt(var + 1e-6) * s + b

    bf = jnp.bfloat16
    y = ln(x, l1s, l1b).astype(bf)
    y = jnp.dot(y, h_pre.astype(bf), preferred_element_type=jnp.float32).astype(bf)
    y = jnp.dot(y, w1.astype(bf), preferred_element_type=jnp.float32).astype(bf)
    y = jax.nn.gelu(y + b1.astype(bf))
    y = jnp.dot(y, w2.astype(bf), preferred_element_type=jnp.float32).astype(bf)
    y = jax.nn.gelu(y + b2.astype(bf))
    y = jnp.dot(y, h_post.astype(bf), preferred_element_type=jnp.float32).astype(bf)
    res = jnp.dot(
        x.astype(bf), h_res.astype(bf), preferred_element_type=jnp.float32
    ).astype(bf)
    return ln(res + y, l2s, l2b).astype(x.dtype)


def test_mhc_pallas_matches_reference():
    d = 128
    k = jax.random.PRNGKey(2)
    keys = jax.random.split(k, 12)
    x = jax.random.normal(keys[0], (300, d), jnp.bfloat16)  # non-multiple of TILE
    h_pre = jax.nn.sigmoid(jax.random.normal(keys[1], (d, d)) * 0.1)
    w1 = jax.random.normal(keys[2], (d, d)) * 0.09
    b1 = jax.random.normal(keys[3], (d,)) * 0.01
    w2 = jax.random.normal(keys[4], (d, d)) * 0.09
    b2 = jax.random.normal(keys[5], (d,)) * 0.01
    h_post = 2 * jax.nn.sigmoid(jax.random.normal(keys[6], (d, d)) * 0.1)
    # Near-identity doubly stochastic residual: a trained-like, well-conditioned
    # point. A Sinkhorn of pure noise is near-uniform, making x@H_res ~ 0 and
    # the post-LN comparison an amplifier of bf16 rounding noise.
    h_res = sinkhorn_log(6.0 * jnp.eye(d) + jax.random.normal(keys[7], (d, d)), 20)
    l1s = jnp.ones((d,)) + 0.1 * jax.random.normal(keys[8], (d,))
    l1b = 0.1 * jax.random.normal(keys[9], (d,))
    l2s = jnp.ones((d,)) + 0.1 * jax.random.normal(keys[10], (d,))
    l2b = 0.1 * jax.random.normal(keys[11], (d,))

    out_pal = mhc_block_pallas(x, h_pre, w1, b1, w2, b2, h_post, h_res,
                               l1s, l1b, l2s, l2b)
    out_ref = _mhc_reference(x, h_pre, w1, b1, w2, b2, h_post, h_res,
                             l1s, l1b, l2s, l2b)
    assert out_pal.shape == (300, d)
    # Exact elementwise parity is unattainable at bf16: GELU differs by ~1 ulp
    # between the Pallas lowering and XLA, and the matmul chain amplifies ulp
    # noise. Assert statistical agreement instead (the layer-level test below
    # checks tight parity at realistic weight scales).
    a = np.asarray(out_pal, np.float32).ravel()
    b = np.asarray(out_ref, np.float32).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.995, corr
    assert np.mean(np.abs(a - b)) < 0.1


def test_mhc_layer_pallas_path_matches_jnp_path(monkeypatch):
    """End-to-end: the layer's use_pallas path equals the standard path."""
    monkeypatch.setenv("HVS_PALLAS_MIN_TOKENS", "1")  # tiny test shapes
    monkeypatch.setenv("HVS_PALLAS_MIN_BATCH", "1")
    from hvs_tpu.models import ManifoldHyperConnection, compute_constraints

    d = 128
    layer_std = ManifoldHyperConnection(
        dim=d, expansion_rate=1, mlp_ratio=1, sk_iters=10, dropout_rate=0.0,
        precomputed_constraints=True,
    )
    layer_pal = ManifoldHyperConnection(
        dim=d, expansion_rate=1, mlp_ratio=1, sk_iters=10, dropout_rate=0.0,
        precomputed_constraints=True, use_pallas=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 7, d))
    v = layer_std.init(jax.random.PRNGKey(0), x)
    # Well-condition the residual: at random init H_res is near-uniform, so the
    # pre-norm signal is ~0 and the final LayerNorm amplifies the ~1-ulp GELU
    # difference between the Pallas lowering and XLA into visible noise. A
    # near-identity H_res (the trained regime) keeps the comparison meaningful.
    params = dict(v["params"])
    params["H_res_raw"] = 6.0 * jnp.eye(d) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(9), (d, d)
    )
    variables = {
        "params": params,
        "constraints": compute_constraints({"layer": params}, 10)["layer"],
    }
    with jax.default_matmul_precision("bfloat16"):
        out_std = layer_std.apply(variables, x)
        out_pal = layer_pal.apply(variables, x)
    a = np.asarray(out_std, np.float32).ravel()
    b = np.asarray(out_pal, np.float32).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.999
    assert np.mean(np.abs(a - b)) < 0.05


# ---------------------------------------------------------------------------
# Packed fused kernel (sub-lane widths via token packing)
# ---------------------------------------------------------------------------


def test_mhc_pallas_packed_supported_predicate():
    from hvs_tpu.ops.pallas import mhc_pallas_packed_supported as sup

    for d in (32, 64, 128, 256, 512):
        assert sup(d), d
    for d in (48, 96, 1024):
        assert not sup(d), d


def _packed_reference(x, w1f, b1, w2, b2, h_post, h_res, l1s, l1b, l2s, l2b):
    """Serve-path math with the folded W1 (bf16 matmuls, fp32 LN stats) —
    mirrors ManifoldHyperConnection's precomputed-constraints branch."""

    def ln(v, s, b):
        v32 = v.astype(jnp.float32)
        mu = jnp.mean(v32, -1, keepdims=True)
        var = jnp.mean(jnp.square(v32 - mu), -1, keepdims=True)
        return (v32 - mu) * jax.lax.rsqrt(var + 1e-6) * s + b

    bf = jnp.bfloat16
    y = ln(x, l1s, l1b).astype(bf)
    y = jnp.dot(y, w1f.astype(bf), preferred_element_type=jnp.float32).astype(bf)
    y = jax.nn.gelu(y + b1.astype(bf))
    y = jnp.dot(y, w2.astype(bf), preferred_element_type=jnp.float32).astype(bf)
    y = jax.nn.gelu(y + b2.astype(bf))
    y = jnp.dot(y, h_post.astype(bf), preferred_element_type=jnp.float32).astype(bf)
    res = jnp.dot(
        x.astype(bf), h_res.astype(bf), preferred_element_type=jnp.float32
    ).astype(bf)
    return ln(res + y, l2s, l2b).astype(x.dtype)


@pytest.mark.parametrize("d", [32, 64, 128])
def test_mhc_pallas_packed_matches_reference(d):
    from hvs_tpu.ops.pallas import mhc_block_pallas_packed

    k = jax.random.PRNGKey(4)
    keys = jax.random.split(k, 12)
    # Token count indivisible by both the packing factor and the tile.
    n = 1234 if d < 128 else 300
    x = jax.random.normal(keys[0], (n, d), jnp.bfloat16)
    w1f = jax.random.normal(keys[1], (d, d)) * 0.09
    b1 = jax.random.normal(keys[2], (d,)) * 0.01
    w2 = jax.random.normal(keys[3], (d, d)) * 0.09
    b2 = jax.random.normal(keys[4], (d,)) * 0.01
    h_post = 2 * jax.nn.sigmoid(jax.random.normal(keys[5], (d, d)) * 0.1)
    h_res = sinkhorn_log(6.0 * jnp.eye(d) + jax.random.normal(keys[6], (d, d)), 20)
    l1s = jnp.ones((d,)) + 0.1 * jax.random.normal(keys[7], (d,))
    l1b = 0.1 * jax.random.normal(keys[8], (d,))
    l2s = jnp.ones((d,)) + 0.1 * jax.random.normal(keys[9], (d,))
    l2b = 0.1 * jax.random.normal(keys[10], (d,))

    out_pal = mhc_block_pallas_packed(
        x, w1f, b1, w2, b2, h_post, h_res, l1s, l1b, l2s, l2b
    )
    out_ref = _packed_reference(
        x, w1f, b1, w2, b2, h_post, h_res, l1s, l1b, l2s, l2b
    )
    assert out_pal.shape == (n, d)
    a = np.asarray(out_pal, np.float32).ravel()
    b = np.asarray(out_ref, np.float32).ravel()
    # Same tolerance rationale as test_mhc_pallas_matches_reference: ~1-ulp
    # GELU lowering differences amplified by the chain + final LN at these
    # random (untrained-like) weight scales. The layer-level test below holds
    # 0.999 at realistic weights.
    assert np.corrcoef(a, b)[0, 1] > 0.995
    assert np.mean(np.abs(a - b)) < 0.05


@pytest.mark.parametrize("d", [32, 64])
def test_mhc_layer_packed_pallas_path_matches_jnp_path(d, monkeypatch):
    """The layer's use_pallas path now reaches sub-lane widths (the backbone's
    stage-1/2 bottleneck channels) through the packed kernel."""
    monkeypatch.setenv("HVS_PALLAS_MIN_TOKENS", "1")  # tiny test shapes
    monkeypatch.setenv("HVS_PALLAS_MIN_BATCH", "1")
    from hvs_tpu.models import ManifoldHyperConnection, compute_constraints

    layer_std = ManifoldHyperConnection(
        dim=d, expansion_rate=1, mlp_ratio=1, sk_iters=10, dropout_rate=0.0,
        precomputed_constraints=True,
    )
    layer_pal = ManifoldHyperConnection(
        dim=d, expansion_rate=1, mlp_ratio=1, sk_iters=10, dropout_rate=0.0,
        precomputed_constraints=True, use_pallas=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 7, d))
    v = layer_std.init(jax.random.PRNGKey(0), x)
    params = dict(v["params"])
    params["H_res_raw"] = 6.0 * jnp.eye(d) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(9), (d, d)
    )
    variables = {
        "params": params,
        "constraints": compute_constraints({"layer": params}, 10)["layer"],
    }
    with jax.default_matmul_precision("bfloat16"):
        out_std = layer_std.apply(variables, x)
        out_pal = layer_pal.apply(variables, x)
    assert out_pal.shape == x.shape
    a = np.asarray(out_std, np.float32).ravel()
    b = np.asarray(out_pal, np.float32).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.999
    assert np.mean(np.abs(a - b)) < 0.05


# ---------------------------------------------------------------------------
# Trace-time gate policy (batch floor + token floor)


def _lowered_has_pallas(layer, variables, x):
    import jax

    jaxpr = jax.make_jaxpr(lambda v, a: layer.apply(v, a))(variables, x)
    return "pallas_call" in str(jaxpr)


@pytest.mark.parametrize(
    "batch,min_batch,expect",
    [(2, 4, False), (4, 4, True), (1, 1, True)],
)
def test_pallas_gate_batch_floor(batch, min_batch, expect, monkeypatch):
    """The engine's latency buckets (batch < HVS_PALLAS_MIN_BATCH) must
    compile pure-XLA programs; throughput buckets must take the kernel
    (on-chip calibration: artifacts/PALLAS_GATE_r04.json)."""
    monkeypatch.setenv("HVS_PALLAS_MIN_TOKENS", "1")
    monkeypatch.setenv("HVS_PALLAS_MIN_BATCH", str(min_batch))
    from hvs_tpu.models import ManifoldHyperConnection, compute_constraints

    d = 128
    layer = ManifoldHyperConnection(
        dim=d, expansion_rate=1, mlp_ratio=1, sk_iters=5, dropout_rate=0.0,
        precomputed_constraints=True, use_pallas=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 5, 7, d))
    v = layer.init(jax.random.PRNGKey(1), x)
    variables = {
        "params": v["params"],
        "constraints": compute_constraints({"l": v["params"]}, 5)["l"],
    }
    assert _lowered_has_pallas(layer, variables, x) == expect
