"""Top-level HybridVisionSystem: CNN+ViT detector with mHC stabilization.

TPU-native redesign of the reference's top model
(reference: src/models/hybrid_vision.py:37-593). Composition (reference order,
:222-402): backbone -> optional ViT enhancement of scale_large (50/50 blend)
-> FPN -> optional RAG on the small scale -> YOLO head -> optional
segmentation/depth heads -> global feature extraction.

Everything is one pure function under jit; stability telemetry flows out through
the ``stability`` sow collection (apply with ``mutable=['stability']``);
detection postprocess (decode+NMS) stays on device via
:func:`hvs_tpu.models.yolo_head.postprocess_detections`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .backbone import HybridVisionBackbone
from .fpn import FeaturePyramidNetwork
from .layers import ManifoldHyperConnection, group_norm
from .rag import RAGVisionKnowledge
from .vit import HybridVisionEncoder
from .yolo_head import YOLODetectionHead, postprocess_detections

Dtype = Any


class SegmentationHead(nn.Module):
    """Upsampling decoder with multi-scale context
    (reference: src/models/hybrid_vision.py:131-146,327-341 — a single-scale
    stub; here the decoder fuses all three FPN scales).

    Accepts either the fused-features dict (multi-scale context: the medium
    and large scales are 1x1-projected, bilinearly upsampled to the small
    scale's grid and concatenated — pixel-level classes that only differ at
    object scale, e.g. square-vs-rectangle, need receptive field beyond the
    stride-8 features; MULTITASK_r03.json measured IoU 0.008 on such classes
    with single-scale input) or a single feature map (reference-parity form).
    """

    num_classes: int = 21
    context_channels: int = 128
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feat) -> jax.Array:
        if isinstance(feat, dict):
            small = feat["fused_small"].astype(self.dtype)
            b, h, w, _ = small.shape
            parts = [small]
            for name in ("fused_medium", "fused_large"):
                ctx = nn.Conv(
                    self.context_channels, (1, 1), dtype=self.dtype,
                    name=f"ctx_{name}",
                )(feat[name].astype(self.dtype))
                parts.append(
                    jax.image.resize(
                        ctx, (b, h, w, self.context_channels), method="bilinear"
                    ).astype(self.dtype)
                )
            x = jnp.concatenate(parts, axis=-1)
        else:
            x = feat.astype(self.dtype)
        for ch in (128, 64):
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), dtype=self.dtype)(x)
            x = group_norm(ch, self.dtype)(x)
            x = nn.silu(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(x)


class DepthHead(nn.Module):
    """Monocular depth decoder (reference: src/models/hybrid_vision.py:148-156,343-353)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feat: jax.Array) -> jax.Array:
        x = feat.astype(self.dtype)
        for ch in (128, 64):
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), dtype=self.dtype)(x)
            x = group_norm(ch, self.dtype)(x)
            x = nn.silu(x)
        return jax.nn.softplus(nn.Conv(1, (1, 1), dtype=self.dtype)(x))


class HybridVisionSystem(nn.Module):
    """The flagship detector (reference: src/models/hybrid_vision.py:37-485).

    Call with NHWC images in [0, 1]-normalized float; ``task`` selects which
    heads run ('detection' | 'classification' | 'segmentation' | 'multi_task').
    """

    num_classes: int = 80
    use_vit: bool = True
    use_rag: bool = False
    rag_classes: Any = None  # KB class names (tuple); None -> COCO
    use_segmentation: bool = False
    use_depth: bool = False
    sk_iters: int = 20
    base_channels: int = 32
    stage_blocks: Sequence[int] = (2, 3, 4, 2)
    stage_channels: Sequence[int] = (64, 128, 256, 512)
    vit_dim: int = 256
    vit_depth: int = 6
    vit_heads: int = 8
    fpn_channels: int = 256
    head_channels: int = 256
    feature_dim: int = 256
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.bfloat16
    monitor: bool = False
    precomputed_constraints: bool = False
    use_pallas: bool = False
    # int8 serving path (backbone + head towers; hvs_tpu/ops/quant.py).
    # act_quant reads calibrated scales from the 'quant' collection;
    # quant_calib runs the float path while sowing 'quant_stats' ranges
    # (always at ALL sites — the calibration is a superset, the quant model
    # reads only the sites its flags enable). act_quant_fpn extends int8 to
    # the FPN laterals/refines/projections (a further ~11% of serve bytes).
    act_quant: bool = False
    act_quant_fpn: bool = False
    # int8 for the backbone's channel-mHC matmul chains (separate knob so its
    # accuracy cost is measurable alone; hvs_tpu/models/layers.py).
    act_quant_mhc: bool = False
    # int8 for the ViT encoder's QKV/out projections + its mHC chains.
    act_quant_vit: bool = False
    quant_calib: bool = False

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        task: str = "detection",
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        outputs: Dict[str, Any] = {}

        scales = HybridVisionBackbone(
            base_channels=self.base_channels,
            stage_blocks=self.stage_blocks,
            stage_channels=self.stage_channels,
            sk_iters=self.sk_iters,
            dtype=self.dtype,
            monitor=self.monitor,
            precomputed_constraints=self.precomputed_constraints,
            use_pallas=self.use_pallas,
            act_quant=self.act_quant,
            act_quant_mhc=self.act_quant_mhc,
            quant_calib=self.quant_calib,
            name="backbone",
        )(images, deterministic)

        if self.use_vit:
            # ViT enhancement, 50/50 blend (reference: hybrid_vision.py:249-260).
            enhanced = HybridVisionEncoder(
                cnn_channels=self.stage_channels[-1],
                dim=self.vit_dim,
                depth=self.vit_depth,
                num_heads=self.vit_heads,
                sk_iters=self.sk_iters,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                monitor=self.monitor,
                precomputed_constraints=self.precomputed_constraints,
                use_pallas=self.use_pallas,
                act_quant=self.act_quant_vit,
                quant_calib=self.quant_calib,
                name="vit_encoder",
            )(scales["scale_large"], deterministic)
            scales = dict(scales)
            scales["scale_large"] = 0.5 * scales["scale_large"] + 0.5 * enhanced

        fused = FeaturePyramidNetwork(
            fpn_channels=self.fpn_channels,
            sk_iters=self.sk_iters,
            dtype=self.dtype,
            monitor=self.monitor,
            precomputed_constraints=self.precomputed_constraints,
            use_pallas=self.use_pallas,
            act_quant=self.act_quant_fpn,
            quant_calib=self.quant_calib,
            name="fpn",
        )(scales, deterministic)

        if self.use_rag:
            # Knowledge injection on the small scale (reference: hybrid_vision.py:266-295).
            small = fused["fused_small"]
            b, h, w, c = small.shape
            tokens = small.reshape(b, h * w, c)
            tokens = RAGVisionKnowledge(
                channels=c, sk_iters=self.sk_iters, dtype=self.dtype,
                precomputed_constraints=self.precomputed_constraints, name="rag",
                use_pallas=self.use_pallas, kb_classes=self.rag_classes,
            )(tokens, deterministic)
            fused = dict(fused)
            # Zero-init learnable gate (ReZero-style) instead of the
            # reference's hard 50/50 blend (hybrid_vision.py:266-295): at init
            # the retrieval path is an EXACT no-op, and the gradient opens it
            # only where it lowers the training loss. Measured 3-way on the
            # shapes benchmark at matched 6k-step budget (RAG_EVAL_r03.json):
            # off 0.863 mAP@0.5 / hard blend 0.540 (AP_small ~0 — the
            # small-object scale is where injected retrieval noise drowns
            # signal first) / this gate 0.576 with AP_small 0.057. The gate
            # strictly beats the reference design but retrieval still nets
            # negative on this benchmark, so use_rag stays default-False.
            gate = self.param("rag_gate", nn.initializers.zeros, (), jnp.float32)
            fused["fused_small"] = small + jnp.tanh(gate) * tokens.reshape(
                b, h, w, c
            ).astype(small.dtype)

        if task in ("detection", "multi_task"):
            det = YOLODetectionHead(
                num_classes=self.num_classes,
                head_channels=self.head_channels,
                sk_iters=self.sk_iters,
                dtype=self.dtype,
                monitor=self.monitor,
                precomputed_constraints=self.precomputed_constraints,
                use_pallas=self.use_pallas,
                act_quant=self.act_quant,
                quant_calib=self.quant_calib,
                name="detection_head",
            )(fused, deterministic)
            outputs["detection"] = det

        if task in ("segmentation", "multi_task") and self.use_segmentation:
            # +1: channel 0 is background (dense masks are class-id+1).
            outputs["segmentation"] = SegmentationHead(
                num_classes=self.num_classes + 1, dtype=self.dtype,
                name="segmentation_head",
            )(fused)

        if task in ("depth", "multi_task") and self.use_depth:
            outputs["depth"] = DepthHead(dtype=self.dtype, name="depth_head")(
                fused["fused_small"]
            )

        # Global feature vector (reference: hybrid_vision.py:369-402): per-scale
        # GAP -> concat -> mHC -> MLP -> feature_dim.
        pooled = jnp.concatenate(
            [jnp.mean(fused[k].astype(jnp.float32), axis=(1, 2))
             for k in ("fused_small", "fused_medium", "fused_large")],
            axis=-1,
        ).astype(self.dtype)
        # Project the 1792-dim concat down before the mHC so the feature head
        # stays inside the 10-30M model budget (an mHC at 1792 alone is ~16M).
        feats = nn.Dense(self.feature_dim, dtype=self.dtype, name="feature_proj")(pooled)
        feats = ManifoldHyperConnection(
            dim=self.feature_dim,
            expansion_rate=1,
            mlp_ratio=2,
            sk_iters=self.sk_iters,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            monitor=self.monitor,
            precomputed_constraints=self.precomputed_constraints,
            use_pallas=self.use_pallas,
            name="mhc_features",
        )(feats, deterministic)
        outputs["features"] = feats

        if task in ("classification", "multi_task"):
            outputs["classification"] = nn.Dense(
                self.num_classes, dtype=self.dtype, name="classifier",
            )(feats)

        outputs["fused_features"] = fused
        return outputs


class LightweightHybridVision(HybridVisionSystem):
    """Edge variant: no ViT/RAG, slimmer stages
    (reference: src/models/hybrid_vision.py:488-540)."""

    use_vit: bool = False
    use_rag: bool = False
    stage_blocks: Sequence[int] = (1, 2, 2, 1)
    stage_channels: Sequence[int] = (48, 96, 192, 384)
    head_channels: int = 128
    fpn_channels: int = 128


class ProductionHybridVision(HybridVisionSystem):
    """Serving variant: telemetry off, dropout zero, constrained matrices
    precomputed at load time — shapes/params identical to the flagship so
    training checkpoints load directly
    (reference: src/models/hybrid_vision.py:543-593)."""

    monitor: bool = False
    dropout_rate: float = 0.0
    precomputed_constraints: bool = True


def detect(
    model: HybridVisionSystem,
    variables: Dict[str, Any],
    images: jax.Array,
    score_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    max_detections: int = 100,
    nms_method: str = "hard",
):
    """Forward + on-device postprocess (reference ``detect()``:
    src/models/hybrid_vision.py:404-439). jit-compatible as a whole."""
    out = model.apply(variables, images, task="detection")
    det = postprocess_detections(
        out["detection"],
        score_threshold=score_threshold,
        iou_threshold=iou_threshold,
        max_detections=max_detections,
        nms_method=nms_method,
    )
    return det, out


def collect_stability_metrics(stability_collection: Dict[str, Any]) -> Dict[str, Any]:
    """Aggregate per-layer sown metrics into the reference's summary dict
    (reference: src/models/hybrid_vision.py:441-457 walks modules; here we walk
    the functional ``stability`` collection returned by ``apply(mutable=...)``)."""
    flat = jax.tree_util.tree_leaves_with_path(stability_collection)
    per_layer: Dict[str, Dict[str, Any]] = {}
    for path, leaf in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        # Path shape: (<module scopes...>, 'metrics', <metric name>).
        metric = keys[-1] if keys else "value"
        layer = "/".join(keys[:-2]) or "root"
        per_layer.setdefault(layer, {})[metric] = leaf
    summary: Dict[str, Any] = {"num_layers": len(per_layer)}
    for metric in ("signal_ratio", "ds_error", "max_eigenvalue"):
        vals = [
            float(v[metric]) for v in per_layer.values() if metric in v
        ]
        if vals:
            summary[f"{metric}_mean"] = sum(vals) / len(vals)
            summary[f"{metric}_max"] = max(vals)
    summary["per_layer"] = per_layer
    return summary
