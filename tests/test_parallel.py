"""Mesh/sharding tests on the 8-device virtual CPU mesh (SURVEY §2.11)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from hvs_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_sharding,
    replicated,
    shard_batch,
    sharded_fraction,
)


def test_make_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh()  # all devices, pure DP
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1


def test_mesh_validation():
    with pytest.raises(AssertionError):
        make_mesh(n_data=3, n_model=2)  # 6 != 8


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(n_data=8, n_model=1)
    batch = {"x": np.ones((16, 4), np.float32), "y": np.zeros((16,), np.int32)}
    sharded = shard_batch(mesh, batch)
    assert len(sharded["x"].sharding.device_set) == 8
    # Each device holds 2 rows.
    shard = sharded["x"].addressable_shards[0]
    assert shard.data.shape == (2, 4)


def test_param_sharding_tp_rules():
    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "attn": {"qkv": {"kernel": jnp.ones((16, 48))},
                 "proj": {"kernel": jnp.ones((16, 16))}},
        "other": {"bias": jnp.ones((16,))},
    }
    shardings = param_sharding(mesh, params)
    qkv = shardings["attn"]["qkv"]["kernel"]
    assert qkv.spec == P(None, "model")
    assert shardings["other"]["bias"].spec == P()


def test_param_sharding_collapses_without_model_axis():
    mesh = make_mesh(n_data=8, n_model=1)
    params = {"attn": {"qkv": {"kernel": jnp.ones((16, 48))}}}
    shardings = param_sharding(mesh, params)
    assert shardings["attn"]["qkv"]["kernel"].spec == P()


def test_tp_rules_match_real_model_params():
    """The TP rules must shard a meaningful fraction of the REAL model's
    parameter bytes under n_model=2 — this is the regression guard for the
    round-2 finding that 'mlp_in/kernel' style rules silently matched nothing
    (hvs_tpu/parallel/mesh.py rules vs models/layers.py param names)."""
    from hvs_tpu.config import ModelConfig

    mcfg = ModelConfig()
    mcfg.detection.num_classes = 8
    model = mcfg.build_model()
    # eval_shape: full flagship param TREE without compiling anything.
    shapes = jax.eval_shape(
        lambda k, x: model.init(k, x, task="detection"),
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )["params"]
    mesh = make_mesh(n_data=4, n_model=2)
    shardings = param_sharding(mesh, shapes)
    frac = sharded_fraction(shardings, shapes)
    # qkv/proj (ViT attention) + mHC mlp_in/mlp_out kernels + H_pre/H_post.
    assert frac["sharded_params"] >= 40, frac
    assert frac["sharded_bytes_fraction"] >= 0.25, frac


def test_psum_gradient_allreduce_semantics():
    """Data-parallel loss over a sharded batch == the unsharded loss."""
    mesh = make_mesh(n_data=8, n_model=1)
    w = jnp.ones((4, 1))
    x = np.random.default_rng(0).standard_normal((16, 4)).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_ref = jax.grad(loss)(w, jnp.asarray(x))
    x_sharded = shard_batch(mesh, {"x": x})["x"]
    w_rep = jax.device_put(w, replicated(mesh))
    g_sharded = jax.jit(jax.grad(loss))(w_rep, x_sharded)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_sharded), rtol=1e-5)


@pytest.mark.heavy
def test_dryrun_multichip_entrypoint():
    """The driver's multichip dry run must execute on the virtual mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
