"""Model-stack tests (behavioral spec: reference src/tests/test_models.py —
constraint ranges, shape preservation, NaN-freedom, gradient sanity, dtype
policy, multi-scale shapes, parameter budgets, serialization round-trip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import serialization

from hvs_tpu.models import (
    HybridVisionBackbone,
    HybridVisionSystem,
    LightweightHybridVision,
    ManifoldHyperConnection,
    MHCTransformerBlock,
    MultiHeadManifoldAttention,
    RMSNorm,
    VisionTransformerDecoder,
    FeaturePyramidNetwork,
    CrossScaleAttention,
    AdaptiveFeatureFusion,
    MultiScaleFeatureFusion,
    YOLODetectionHead,
    decode_predictions,
    make_anchor_grid,
    postprocess_detections,
    detect,
    collect_stability_metrics,
)
from hvs_tpu.ops import doubly_stochastic_error


# --------------------------------------------------------------------------
# mHC layer (reference test_models.py:145-204)
# --------------------------------------------------------------------------


class TestManifoldHyperConnection:
    def _layer(self, **kw):
        defaults = dict(dim=16, sk_iters=10, dropout_rate=0.0)
        defaults.update(kw)
        return ManifoldHyperConnection(**defaults)

    def test_constraint_ranges(self, key):
        layer = self._layer()
        x = jnp.ones((2, 16))
        v = layer.init(key, x)
        p = v["params"]
        h_pre = jax.nn.sigmoid(p["H_pre_raw"])
        h_post = 2 * jax.nn.sigmoid(p["H_post_raw"])
        assert float(h_pre.min()) >= 0 and float(h_pre.max()) <= 1
        assert float(h_post.min()) >= 0 and float(h_post.max()) <= 2
        from hvs_tpu.ops import sinkhorn_log

        h_res = sinkhorn_log(p["H_res_raw"], 20)
        assert float(doubly_stochastic_error(h_res)) < 1e-3

    def test_shape_preservation_and_finite(self, key):
        layer = self._layer()
        for shape in [(2, 16), (2, 7, 16), (2, 4, 4, 16)]:
            x = jax.random.normal(key, shape)
            v = layer.init(key, x)
            y = layer.apply(v, x)
            assert y.shape == shape
            assert bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))

    def test_gradients_sane(self, key):
        layer = self._layer()
        x = jax.random.normal(key, (4, 16))
        v = layer.init(key, x)

        def loss(params):
            return jnp.mean(layer.apply({"params": params}, x).astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss))(v["params"])
        norms = [float(jnp.linalg.norm(t)) for t in jax.tree_util.tree_leaves(g)]
        total = float(np.sqrt(sum(n**2 for n in norms)))
        assert 0 < total < 100, total  # reference asserts 0 < ||g|| < 100

    def test_bf16_output_dtype(self, key):
        layer = self._layer(dtype=jnp.bfloat16)
        x = jax.random.normal(key, (2, 16))
        v = layer.init(key, x)
        assert layer.apply(v, x).dtype == jnp.bfloat16
        # params stay fp32
        assert v["params"]["H_res_raw"].dtype == jnp.float32

    def test_monitor_collection(self, key):
        layer = self._layer(monitor=True, monitor_eigs=True)
        x = jax.random.normal(key, (2, 16))
        v = layer.init(key, x)
        _, coll = layer.apply(v, x, mutable=["stability"])
        metrics = coll["stability"]["metrics"]
        assert float(metrics["max_eigenvalue"]) <= 1.0 + 1e-3
        assert float(metrics["ds_error"]) < 1e-3
        assert float(metrics["signal_ratio"]) > 0

    def test_non_expansive_residual(self, key):
        """Doubly stochastic residual cannot amplify: ||x @ H_res|| <= ||x||_1-ish.
        Check spectral norm of H_res <= 1 + tol."""
        layer = self._layer()
        v = layer.init(key, jnp.ones((2, 16)))
        from hvs_tpu.ops import sinkhorn_log

        h_res = sinkhorn_log(v["params"]["H_res_raw"], 30)
        s = np.linalg.svd(np.asarray(h_res, np.float64), compute_uv=False)
        assert s[0] <= 1.0 + 1e-3


def test_rmsnorm(key):
    n = RMSNorm()
    x = jax.random.normal(key, (2, 8)) * 10
    v = n.init(key, x)
    y = np.asarray(n.apply(v, x), np.float32)
    rms = np.sqrt(np.mean(y**2, axis=-1))
    np.testing.assert_allclose(rms, 1.0, atol=0.05)


def test_manifold_attention(key):
    attn = MultiHeadManifoldAttention(dim=16, num_heads=2, sk_iters=5, dropout_rate=0.0)
    x = jax.random.normal(key, (2, 6, 16))
    v = attn.init(key, x)
    y = attn.apply(v, x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))


def test_transformer_block(key):
    blk = MHCTransformerBlock(dim=16, num_heads=2, sk_iters=5, dropout_rate=0.0)
    x = jax.random.normal(key, (2, 6, 16))
    v = blk.init(key, x)
    assert blk.apply(v, x).shape == x.shape


def test_vit_decoder(key):
    dec = VisionTransformerDecoder(dim=16, depth=1, num_heads=2, num_queries=4,
                                   dropout_rate=0.0)
    mem = jax.random.normal(key, (2, 9, 16))
    v = dec.init(key, mem)
    y = dec.apply(v, mem)
    assert y.shape == (2, 4, 16)


# --------------------------------------------------------------------------
# Backbone (reference test_models.py:252-324)
# --------------------------------------------------------------------------


TINY_BB = dict(base_channels=8, stage_channels=(16, 24, 32, 40), stage_blocks=(1, 1, 1, 1),
               sk_iters=5)


def test_backbone_multiscale_shapes(key):
    bb = HybridVisionBackbone(**TINY_BB)
    x = jnp.zeros((2, 64, 64, 3))
    v = jax.jit(bb.init)(key, x)  # eager init/apply dispatches thousands of ops
    out = jax.jit(bb.apply)(v, x)
    assert out["scale_small"].shape == (2, 8, 8, 24)
    assert out["scale_medium"].shape == (2, 4, 4, 32)
    assert out["scale_large"].shape == (2, 2, 2, 40)


@pytest.mark.slow
def test_backbone_param_budget(key):
    """Reference asserts 2-5M params for the full-size backbone
    (src/tests/test_models.py:316-324). eval_shape: exact shapes, no compiles."""
    bb = HybridVisionBackbone(sk_iters=5)
    v = jax.eval_shape(lambda k: bb.init(k, jnp.zeros((1, 64, 64, 3))), key)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    assert 2e6 < n < 5e6, n


# --------------------------------------------------------------------------
# FPN / fusion
# --------------------------------------------------------------------------


def _tiny_scales(key):
    return {
        "scale_small": jax.random.normal(key, (2, 8, 8, 24)),
        "scale_medium": jax.random.normal(key, (2, 4, 4, 32)),
        "scale_large": jax.random.normal(key, (2, 2, 2, 40)),
    }


def test_fpn_shapes(key):
    fpn = FeaturePyramidNetwork(fpn_channels=16, out_channels=(16, 24, 32), sk_iters=5)
    feats = _tiny_scales(key)
    v = jax.jit(fpn.init)(key, feats)
    out = jax.jit(fpn.apply)(v, feats)
    assert out["fused_small"].shape == (2, 8, 8, 16)
    assert out["fused_medium"].shape == (2, 4, 4, 24)
    assert out["fused_large"].shape == (2, 2, 2, 32)


def test_cross_scale_attention(key):
    csa = CrossScaleAttention(channels=16, num_heads=2)
    feats = _tiny_scales(key)
    v = csa.init(key, feats)
    out = csa.apply(v, feats)
    assert set(out) == set(feats)
    assert out["scale_small"].shape == (2, 8, 8, 16)


def test_adaptive_and_multiscale_fusion(key):
    feats = _tiny_scales(key)
    aff = AdaptiveFeatureFusion(out_channels=16)
    v = aff.init(key, feats)
    assert aff.apply(v, feats).shape == (2, 8, 8, 16)
    msf = MultiScaleFeatureFusion(out_channels=16)
    v2 = msf.init(key, feats)
    assert msf.apply(v2, feats).shape == (2, 8, 8, 16)


# --------------------------------------------------------------------------
# YOLO head + decode (reference test_inference.py:311-419 decode/NMS checks)
# --------------------------------------------------------------------------


def test_decode_known_values():
    """Zero logits decode to anchor-centered boxes: sigmoid(0)=0.5 centers,
    exp(0)=1 -> anchor-sized boxes."""
    anchors = ((0.1, 0.2),)
    grid = make_anchor_grid(2, 2, anchors)
    raw = jnp.zeros((1, 2, 2, 1, 7))  # 2 classes
    dec = decode_predictions(raw, jnp.asarray(grid))
    boxes = np.asarray(dec["boxes"])  # [1,2,2,1,4]
    # Cell (0,0): center (0.25, 0.25), size (0.1, 0.2)
    np.testing.assert_allclose(
        boxes[0, 0, 0, 0], [0.25 - 0.05, 0.25 - 0.1, 0.25 + 0.05, 0.25 + 0.1], atol=1e-6
    )
    # objectness sigmoid(0) = 0.5; cls 0.5 -> score 0.25
    np.testing.assert_allclose(np.asarray(dec["scores"])[0, 0, 0, 0], 0.25, atol=1e-6)


def test_yolo_head_and_postprocess(key):
    head = YOLODetectionHead(num_classes=4, head_channels=16, sk_iters=5)
    feats = {
        "fused_small": jax.random.normal(key, (2, 8, 8, 16)),
        "fused_medium": jax.random.normal(key, (2, 4, 4, 24)),
        "fused_large": jax.random.normal(key, (2, 2, 2, 32)),
    }
    import functools
    v = jax.jit(head.init)(key, feats)
    out = jax.jit(head.apply)(v, feats)
    n = (8 * 8 + 4 * 4 + 2 * 2) * 3
    assert out["boxes"].shape == (2, n, 4)
    assert out["scores"].shape == (2, n, 4)
    det = jax.jit(functools.partial(
        postprocess_detections, score_threshold=0.01, max_detections=16,
        pre_nms_top_k=64))(out)
    assert det.boxes.shape == (2, 16, 4)
    assert det.scores.shape == (2, 16)


# --------------------------------------------------------------------------
# Full model (reference test_models.py:366-562)
# --------------------------------------------------------------------------


TINY_MODEL = dict(
    num_classes=4,
    base_channels=8,
    stage_channels=(16, 24, 32, 40),
    stage_blocks=(1, 1, 1, 1),
    vit_dim=16,
    vit_depth=1,
    vit_heads=2,
    fpn_channels=16,
    head_channels=16,
    feature_dim=32,
    sk_iters=5,
    dropout_rate=0.0,
)


@pytest.fixture(scope="module")
def tiny_model_and_vars():
    import functools

    model = HybridVisionSystem(**TINY_MODEL)
    x = jnp.zeros((1, 64, 64, 3))
    # jitted init: the eager path dispatches thousands of tiny per-op
    # compiles (67 s of the r3 cold lane); one compiled graph also hits the
    # persistent test compile cache across runs.
    v = jax.jit(functools.partial(model.init, task="detection"))(
        jax.random.PRNGKey(0), x
    )
    # ONE shared batch-1 forward program for every full-model test below:
    # eager applies re-dispatch thousands of tiny ops per test (~26 s each on
    # this host) and per-test jit closures each pay a fresh full-model XLA
    # compile; a single jit object traced once serves them all.
    fwd = jax.jit(lambda vv, xx: model.apply(vv, xx, task="detection"))
    return model, v, fwd


def test_full_model_detection(tiny_model_and_vars):
    model, v, fwd = tiny_model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = fwd(v, x)
    assert "detection" in out and "features" in out
    assert out["features"].shape == (1, 32)
    assert bool(jnp.all(jnp.isfinite(out["detection"]["boxes"])))
    # Batch-independence at the wiring level, zero extra compiles (numerical
    # batch>1 execution is covered by the engine bucket tests).
    out2 = jax.eval_shape(
        lambda vv: model.apply(vv, jnp.zeros((2, 64, 64, 3)), task="detection"),
        v,
    )
    assert out2["features"].shape == (2, 32)


def test_full_model_detect_e2e(tiny_model_and_vars):
    model, v, _ = tiny_model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))
    # detect() is jit-compatible as a whole — compile it once instead of
    # paying ~45 s of eager per-op dispatch (incl. eager NMS loops) on this
    # 1-core host; the jitted program also persists in the disk cache.
    det, out = jax.jit(
        lambda vv, xx: detect(model, vv, xx, score_threshold=0.01,
                              max_detections=8)
    )(v, x)
    assert det.boxes.shape == (1, 8, 4)
    assert det.num_valid.shape == (1,)


def test_full_model_deterministic(tiny_model_and_vars):
    """Same input -> identical outputs (reference test_inference.py:181-196)."""
    model, v, fwd = tiny_model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    a = fwd(v, x)["detection"]["boxes"]
    b = fwd(v, x)["detection"]["boxes"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_serialization_roundtrip(tiny_model_and_vars, tmp_path):
    """Save/load -> allclose outputs (reference test_models.py:483-525)."""
    model, v, fwd = tiny_model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3))
    out1 = fwd(v, x)["detection"]["boxes"]
    blob = serialization.to_bytes(v)
    path = tmp_path / "model.msgpack"
    path.write_bytes(blob)
    v2 = serialization.from_bytes(v, path.read_bytes())
    out2 = fwd(v2, x)["detection"]["boxes"]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_classification_task(tiny_model_and_vars):
    """Wiring/shape regression guard via eval_shape — zero compiles (the
    classification graph is otherwise a one-off full-model XLA compile the
    default lane pays ~25 s for; numerical execution of the shared layers is
    covered by the detection tests)."""
    model, _, _ = tiny_model_and_vars
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.eval_shape(
        lambda k: model.init(k, x, task="classification"), jax.random.PRNGKey(0)
    )
    out = jax.eval_shape(
        lambda vv: model.apply(vv, x, task="classification"), v
    )
    assert out["classification"].shape == (1, 4)


@pytest.mark.heavy
def test_stability_metrics_aggregation():
    model = HybridVisionSystem(**{**TINY_MODEL, "monitor": True})
    x = jnp.zeros((1, 64, 64, 3))
    import functools
    v = jax.jit(functools.partial(model.init, task="detection"))(
        jax.random.PRNGKey(0), x
    )
    _, coll = model.apply(v, x, task="detection", mutable=["stability"])
    s = collect_stability_metrics(coll["stability"])
    assert s["num_layers"] > 5
    assert s["ds_error_max"] < 1e-2


@pytest.mark.slow
def test_full_size_param_budget():
    """Reference asserts 10-30M total params (src/tests/test_models.py:544-562).

    ``jax.eval_shape`` traces abstractly — exact shapes, zero compiles/executes
    (an eager full-flagship init costs minutes on a 1-core CI host).
    """
    model = HybridVisionSystem(sk_iters=5)
    v = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 64, 64, 3)), task="detection"),
        jax.random.PRNGKey(0),
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    assert 10e6 < n < 30e6, n


@pytest.mark.heavy
def test_rag_gate_identity_at_init():
    """The RAG blend is a zero-init learnable gate (ReZero-style), so at init
    the retrieval path is an EXACT no-op: perturbing every RAG parameter must
    not change the detector outputs, and opening the gate must. Guards against
    regressing to the reference's hard 50/50 blend (hybrid_vision.py:266-295),
    which measured -0.32 mAP@0.5 at matched budget (RAG_EVAL_r03.json)."""
    model = HybridVisionSystem(**TINY_MODEL, use_rag=True)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 64, 64, 3))
    import functools
    v = jax.jit(functools.partial(model.init, task="detection"))(
        jax.random.PRNGKey(0), x
    )
    assert v["params"]["rag_gate"].shape == ()
    assert float(v["params"]["rag_gate"]) == 0.0

    out0 = model.apply(v, x, task="detection")["detection"]["boxes"]

    perturbed = dict(v["params"])
    perturbed["rag"] = jax.tree_util.tree_map(
        lambda p: p + 3.0, v["params"]["rag"]
    )
    out_pert = model.apply({"params": perturbed}, x, task="detection")
    np.testing.assert_array_equal(
        np.asarray(out0), np.asarray(out_pert["detection"]["boxes"])
    )

    opened = dict(v["params"])
    opened["rag_gate"] = jnp.asarray(1.0)
    out_open = model.apply({"params": opened}, x, task="detection")
    assert not np.allclose(
        np.asarray(out0), np.asarray(out_open["detection"]["boxes"])
    )


def test_precomputed_constraints_parity():
    """Serving fast path (constraints precomputed at load) must produce the
    same outputs as the training path that re-runs Sinkhorn each forward.

    Compared at fp32: the serve path additionally folds H_pre @ W1 into one
    constant matrix (algebraically exact, different rounding), so outputs are
    equal up to float rounding, not bit-identical — at bf16 the per-layer
    rounding deltas compound, so the parity check runs the fp32 variant."""
    from hvs_tpu.models import compute_constraints

    kw = dict(TINY_MODEL, dtype=jnp.float32)
    train_model = HybridVisionSystem(**kw)
    serve_model = HybridVisionSystem(**kw, precomputed_constraints=True)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 64, 64, 3))
    import functools
    v = jax.jit(functools.partial(train_model.init, task="detection"))(
        jax.random.PRNGKey(0), x
    )
    # jit both applies: eager full-model dispatch costs ~10 s each on this
    # 1-core host; the fp32 variants are unique programs but compile fast at
    # the test lane's opt level 0.
    out_train = jax.jit(functools.partial(train_model.apply, task="detection"))(
        v, x)["detection"]["boxes"]
    constraints = jax.jit(functools.partial(
        compute_constraints, sk_iters=TINY_MODEL["sk_iters"]))(v["params"])
    out_serve = jax.jit(functools.partial(serve_model.apply, task="detection"))(
        {"params": v["params"], "constraints": constraints}, x
    )["detection"]["boxes"]
    np.testing.assert_allclose(
        np.asarray(out_train), np.asarray(out_serve), atol=2e-4, rtol=1e-3
    )


def test_w1_fold_is_algebraically_exact():
    """The folded serve chain LN(x) @ (H_pre @ W1) must equal the unfolded
    LN(x) @ H_pre @ W1 exactly in fp64 (pure linear-into-linear identity)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    d, hidden, mh = 24, 24, 48
    x = rng.standard_normal((7, d))
    h_pre = 1.0 / (1.0 + np.exp(-rng.standard_normal((d, hidden))))
    w1 = rng.standard_normal((hidden, mh))
    np.testing.assert_allclose((x @ h_pre) @ w1, x @ (h_pre @ w1), rtol=1e-12)


# ---------------------------------------------------------------------------
# GroupNorm drop-in + fused serve tail (GN -> SE -> residual -> SiLU in one
# elementwise pass; ConvMHCBlock). Measured +2.9% serve FPS on the HBM-bound
# program (894-898 vs 871.8 FPS @640 batch16); mAP unchanged at 0.9247.


def test_group_norm_matches_flax():
    """hvs GroupNorm must be a numerical drop-in for nn.GroupNorm (same param
    tree via class-name auto-naming, fp32 fast-variance stats)."""
    from flax import linen as nn

    from hvs_tpu.models.layers import group_norm

    for c, shape in ((32, (2, 9, 9, 32)), (16, (3, 5, 16))):
        for dt in (jnp.float32, jnp.bfloat16):
            mine = group_norm(c, dt)
            ref = nn.GroupNorm(num_groups=8, dtype=dt, epsilon=1e-5)
            x = jax.random.normal(jax.random.PRNGKey(0), shape) * 3 + 1
            v = {"params": {
                "scale": jax.random.normal(jax.random.PRNGKey(2), (c,)) + 1.0,
                "bias": jax.random.normal(jax.random.PRNGKey(3), (c,)),
            }}
            a = np.asarray(mine.apply(v, x), np.float32)
            b = np.asarray(ref.apply(v, x), np.float32)
            tol = 1e-5 if dt == jnp.float32 else 0.05
            assert np.abs(a - b).max() < tol
            # init must produce the identical tree (checkpoint compatibility)
            assert jax.tree_util.tree_structure(
                mine.init(jax.random.PRNGKey(1), x)
            ) == jax.tree_util.tree_structure(v)


@pytest.mark.parametrize("stride,channels", [(2, 32), (1, 24)])
def test_conv_block_fused_tail_matches_standard(stride, channels, monkeypatch):
    """The serve tail (GN+SE+residual+SiLU folded to silu(y*s+t+shortcut))
    must equal the standard per-step path to float rounding, for both the
    projection and identity shortcuts; and both modes must init the
    identical param tree."""
    from hvs_tpu.models import compute_constraints
    from hvs_tpu.models.backbone import ConvMHCBlock

    blk = ConvMHCBlock(
        channels=channels, stride=stride, sk_iters=5, dtype=jnp.float32,
        precomputed_constraints=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 24))
    v = blk.init(jax.random.PRNGKey(1), x)
    cons = compute_constraints({"b": v["params"]}, sk_iters=5)["b"]
    variables = {"params": v["params"], "constraints": cons}

    monkeypatch.setenv("HVS_FUSE_NORMS", "1")
    out_fused = jax.jit(lambda vv, xx: blk.apply(vv, xx))(variables, x)
    monkeypatch.setenv("HVS_FUSE_NORMS", "0")
    out_std = jax.jit(lambda vv, xx: blk.apply(vv, xx))(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_std), atol=1e-4
    )
    v_std = blk.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        v_std
    )
