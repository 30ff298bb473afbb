"""Int8 PTQ serve path: primitives, calibration, and float/quant parity.

The serve program is HBM-bandwidth-bound (artifacts/ROOFLINE_r03.json), so the
int8 path's job is halving the bytes of the residual stream while staying
accurate. These tests pin: quantization math, per-channel weight quant, the
calibrate -> 'quant' collection flow, param-tree identity with the float model
(checkpoints must load unchanged), and output closeness on a tiny backbone.
(Reference never implements its INT8 config flags: src/inference/engine.py:
162-193 TensorRT delegation only.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from hvs_tpu.models.backbone import HybridVisionBackbone
from hvs_tpu.ops import (
    build_quant_collection,
    conv_int8,
    dequantize_tensor,
    merge_max_stats,
    quantization_error,
    quantize_tensor,
    quantize_weight_per_channel,
)

TINY_BB = dict(
    base_channels=8, stage_channels=(16, 24, 32, 40), stage_blocks=(1, 1, 1, 1),
    sk_iters=3,
)


def test_quant_roundtrip_error_bounded():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 64)) * 3.0
    scale = jnp.max(jnp.abs(x))
    err = float(quantization_error(x, scale))
    # max roundtrip error is scale/254 per element; mean must be well under.
    assert err < float(scale) / 127.0
    q = quantize_tensor(x, scale)
    assert q.dtype == jnp.int8
    back = dequantize_tensor(q, scale, jnp.float32)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               atol=float(scale) / 127.0)


def test_quant_uncalibrated_scale_is_finite():
    x = jnp.ones((4, 4)) * 100.0
    q = quantize_tensor(x, jnp.zeros(()))  # zero scale must not produce nan
    assert np.isfinite(np.asarray(dequantize_tensor(q, jnp.zeros(())), np.float32)).all()


def test_weight_per_channel_scales():
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16))
    k = k.at[..., 0].multiply(10.0)  # one loud channel must not wash out others
    q, s = quantize_weight_per_channel(k)
    assert q.dtype == jnp.int8 and s.shape == (16,)
    back = q.astype(np.float32) * (np.asarray(s) / 127.0)
    np.testing.assert_allclose(back, np.asarray(k, np.float32),
                               atol=float(np.max(np.asarray(s))) / 127.0 + 1e-6)
    # dead channel -> scale 1, not 0
    k0 = k.at[..., 3].set(0.0)
    _, s0 = quantize_weight_per_channel(k0)
    assert float(s0[3]) == 1.0


def test_conv_int8_matches_float_conv():
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (2, 16, 16, 8))
    k = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 8, 16)) * 0.1
    scale = jnp.max(jnp.abs(x))
    y_q = conv_int8(quantize_tensor(x, scale), k, scale, out_dtype=jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    y_f = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn)
    # int8 a/w: relative error ~1% of the output range is the expected regime.
    denom = float(jnp.max(jnp.abs(y_f))) + 1e-6
    rel = float(jnp.max(jnp.abs(y_q - y_f))) / denom
    assert rel < 0.05, rel


def test_build_quant_collection_and_merge():
    stats_a = {"block": {"x_scale": (jnp.asarray(1.5),)}}
    stats_b = {"block": {"x_scale": (jnp.asarray(2.5),)}}
    merged = merge_max_stats([stats_a, stats_b])
    col = build_quant_collection(merged)
    assert float(col["block"]["x_scale"]) == 2.5
    col_m = build_quant_collection(merged, margin=0.8)
    assert abs(float(col_m["block"]["x_scale"]) - 2.0) < 1e-6


@pytest.fixture(scope="module")
def tiny_backbone_setup():
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (2, 64, 64, 3), jnp.float32)
    float_bb = HybridVisionBackbone(**TINY_BB)
    v = jax.jit(float_bb.init)(rng, imgs)
    return float_bb, v, imgs


# Heavy lane: the int8 chain is a shipped negative (float is the serve
# default, QUANT_r04.json) — its full-tree parity check (~15 s of unique
# programs) runs nightly; the per-block int8 tests keep default coverage.
@pytest.mark.heavy
def test_param_tree_identical_and_outputs_close(tiny_backbone_setup):
    """The quantized twin must load float checkpoints unchanged and stay close."""
    float_bb, v, imgs = tiny_backbone_setup
    quant_bb = HybridVisionBackbone(**TINY_BB, act_quant=True)
    vq = jax.jit(quant_bb.init)(jax.random.PRNGKey(0), imgs)
    flat_f = set(traverse_util.flatten_dict(v["params"]))
    flat_q = set(traverse_util.flatten_dict(vq["params"]))
    assert flat_f == flat_q

    # calibrate: run float path with quant_calib=True, fold sown ranges.
    calib_bb = HybridVisionBackbone(**TINY_BB, quant_calib=True)
    _, mut = jax.jit(
        lambda vv, im: calib_bb.apply(vv, im, mutable=["quant_stats"])
    )(v, imgs)
    scales = build_quant_collection(mut["quant_stats"])
    # every quant variable the int8 model declares is calibrated (calibration
    # sows a SUPERSET — it includes sites for knobs this model has off, e.g.
    # the mHC-chain scales behind act_quant_mhc)
    assert set(traverse_util.flatten_dict(vq["quant"])) <= set(
        traverse_util.flatten_dict(scales)
    )

    out_f = jax.jit(float_bb.apply)(v, imgs)
    out_q = jax.jit(quant_bb.apply)({"params": v["params"], "quant": scales}, imgs)
    for key in out_f:
        f = np.asarray(out_f[key], np.float32)
        q = np.asarray(out_q[key], np.float32)
        assert np.isfinite(q).all()
        denom = np.abs(f).mean() + 1e-6
        rel = np.abs(f - q).mean() / denom
        assert rel < 0.35, (key, rel)  # int8 through 4 stages of a RANDOM
        # (untrained, unsmoothed) net; trained-model closeness is asserted by
        # the on-chip eval artifact (QUANT_r04.json), not this unit bound.


def test_matmul_int8_matches_float_matmul():
    from hvs_tpu.ops import matmul_int8

    rng = np.random.default_rng(0)
    x = rng.standard_normal((32, 24)).astype(np.float32)
    w = rng.standard_normal((24, 48)).astype(np.float32)
    scale = jnp.asarray(np.abs(x).max(), jnp.float32)
    x_q = quantize_tensor(jnp.asarray(x), scale)
    out = np.asarray(matmul_int8(x_q, jnp.asarray(w), scale,
                                 out_dtype=jnp.float32))
    ref = x @ w
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-6)
    assert rel < 0.02, rel


def test_matmul_int8_batched_leading_dims():
    from hvs_tpu.ops import matmul_int8

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    w = rng.standard_normal((16, 16)).astype(np.float32)
    scale = jnp.asarray(np.abs(x).max(), jnp.float32)
    out = matmul_int8(quantize_tensor(jnp.asarray(x), scale), jnp.asarray(w),
                      scale, out_dtype=jnp.float32)
    assert out.shape == (2, 5, 16)
    rel = np.abs(np.asarray(out) - x @ w).mean() / (np.abs(x @ w).mean() + 1e-6)
    assert rel < 0.03, rel


@pytest.mark.slow
def test_mhc_int8_chain_calibrated_close_to_float():
    """act_quant_mhc: the mHC matmul chain serves int8 with calibrated scales
    and stays close to the float serve path (precomputed constraints)."""
    from hvs_tpu.models import compute_constraints
    from hvs_tpu.models.layers import ManifoldHyperConnection

    kw = dict(dim=32, expansion_rate=1, mlp_ratio=1, sk_iters=5,
              dropout_rate=0.0, dtype=jnp.float32)
    float_layer = ManifoldHyperConnection(**kw, precomputed_constraints=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    v = float_layer.init(jax.random.PRNGKey(1), x)
    cons = compute_constraints(v["params"], sk_iters=5)

    # Calibrate: float path with quant_calib sows the 4 chain sites.
    calib_layer = ManifoldHyperConnection(**kw, quant_calib=True)
    _, mut = calib_layer.apply(v, x, mutable=["quant_stats"])
    scales = build_quant_collection(mut["quant_stats"])
    assert set(scales) == {"y1_scale", "a1_scale", "a2_scale", "x_scale"}

    q_layer = ManifoldHyperConnection(**kw, precomputed_constraints=True,
                                      act_quant=True)
    out_f = float_layer.apply({"params": v["params"], "constraints": cons}, x)
    out_q = q_layer.apply(
        {"params": v["params"], "constraints": cons, "quant": scales}, x
    )
    f = np.asarray(out_f, np.float32)
    q = np.asarray(out_q, np.float32)
    assert np.isfinite(q).all()
    rel = np.abs(f - q).mean() / (np.abs(f).mean() + 1e-6)
    # RANDOM-init layer: 4 chained int8 matmuls on unsmoothed activations is
    # the worst case; trained-model closeness is what QUANT_r04.json measures.
    assert rel < 0.15, rel


@pytest.mark.slow
def test_mhc_int8_noop_without_precomputed_constraints():
    """act_quant on a training-path (non-precomputed) layer must be a no-op:
    no quant variables declared, float output unchanged."""
    from hvs_tpu.models.layers import ManifoldHyperConnection

    kw = dict(dim=16, expansion_rate=1, mlp_ratio=1, sk_iters=5,
              dropout_rate=0.0, dtype=jnp.float32)
    base = ManifoldHyperConnection(**kw)
    quant = ManifoldHyperConnection(**kw, act_quant=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 16))
    v = base.init(jax.random.PRNGKey(3), x)
    vq = quant.init(jax.random.PRNGKey(3), x)
    assert "quant" not in vq
    np.testing.assert_allclose(
        np.asarray(base.apply(v, x)), np.asarray(quant.apply(v, x)),
        rtol=1e-6, atol=1e-6,
    )


def test_merge_percentile_stats_tames_outlier_batch():
    from hvs_tpu.ops import merge_percentile_stats

    trees = [{"block": {"x_scale": (jnp.asarray(float(v)),)}}
             for v in [1.0, 1.1, 0.9, 1.05, 50.0]]  # one outlier batch
    p90 = build_quant_collection(merge_percentile_stats(trees, 90.0))
    pmax = build_quant_collection(merge_max_stats(trees))
    assert float(pmax["block"]["x_scale"]) == 50.0
    assert float(p90["block"]["x_scale"]) < 31.0  # outlier influence tamed
    # 100th percentile == max
    p100 = build_quant_collection(merge_percentile_stats(trees, 100.0))
    assert float(p100["block"]["x_scale"]) == 50.0


@pytest.mark.slow
def test_vit_block_int8_calibrated_close_to_float():
    """act_quant on MHCTransformerBlock: QKV/proj + mHC-chain int8 with
    calibrated scales stays close to the float block; float checkpoints load
    unchanged (identical param tree)."""
    from hvs_tpu.models import compute_constraints
    from hvs_tpu.models.layers import MHCTransformerBlock

    kw = dict(dim=32, num_heads=2, expansion_rate=1, mlp_ratio=2, sk_iters=5,
              dropout_rate=0.0, dtype=jnp.float32)
    float_blk = MHCTransformerBlock(**kw, precomputed_constraints=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 32))
    v = float_blk.init(jax.random.PRNGKey(1), x)
    cons = compute_constraints(v["params"], sk_iters=5)

    q_blk = MHCTransformerBlock(**kw, precomputed_constraints=True,
                                act_quant=True)
    vq = q_blk.init(jax.random.PRNGKey(1), x)
    assert set(traverse_util.flatten_dict(v["params"])) == set(
        traverse_util.flatten_dict(vq["params"])
    )

    calib_blk = MHCTransformerBlock(**kw, quant_calib=True)
    _, mut = calib_blk.apply(v, x, mutable=["quant_stats"])
    scales = build_quant_collection(mut["quant_stats"])
    assert "qkv_in_scale" in scales["attn"] and "proj_in_scale" in scales["attn"]
    assert "y1_scale" in scales["mhc_ffn"]

    out_f = float_blk.apply({"params": v["params"], "constraints": cons}, x)
    out_q = q_blk.apply(
        {"params": v["params"], "constraints": cons, "quant": scales}, x
    )
    f = np.asarray(out_f, np.float32)
    q = np.asarray(out_q, np.float32)
    assert np.isfinite(q).all()
    rel = np.abs(f - q).mean() / (np.abs(f).mean() + 1e-6)
    assert rel < 0.15, rel  # random-init worst case; trained closeness is
    # what QUANT_r04.json measures on chip
