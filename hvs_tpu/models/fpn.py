"""Multi-scale feature fusion: FPN and attention-based variants (NHWC).

TPU-native redesign of the reference fusion stack
(reference: src/models/feature_fusion.py:10-455):

  * :class:`FeaturePyramidNetwork` — 1x1 laterals to 256ch, top-down
    nearest-upsample + add, 3x3 refine, per-level channel mHC, output
    projections to [256, 512, 1024] channels (reference :10-153).
  * :class:`MultiScaleFeatureFusion` — resize-concat-project fusion (:156-253).
  * :class:`CrossScaleAttention` — all-pairs attention across pooled scale
    summaries (:256-360) — vectorized, no per-scale Python loops in the hot path.
  * :class:`AdaptiveFeatureFusion` — learned softmax scale weights (:363-455).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ManifoldHyperConnection, group_norm

Dtype = Any

SCALES = ("scale_small", "scale_medium", "scale_large")


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample (matches reference's F.interpolate nearest)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class FeaturePyramidNetwork(nn.Module):
    """Top-down FPN with mHC fusion per level
    (reference: src/models/feature_fusion.py:10-153).

    Input: backbone dict (128/256/512 ch at strides 8/16/32).
    Output: {"fused_small": 256ch, "fused_medium": 512ch, "fused_large": 1024ch}
    (reference output channels :82-153).
    """

    fpn_channels: int = 256
    out_channels: Sequence[int] = (256, 512, 1024)
    sk_iters: int = 20
    use_mhc: bool = True
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16
    monitor: bool = False
    precomputed_constraints: bool = False
    use_pallas: bool = False
    act_quant: bool = False
    quant_calib: bool = False

    @nn.compact
    def __call__(
        self, features: Dict[str, jax.Array], deterministic: bool = True
    ) -> Dict[str, jax.Array]:
        # int8 sites (same scheme as backbone.py; FPN is ~11% of the serve
        # program's HBM bytes, artifacts/BYTES_r03.json): the lateral inputs
        # (the wide backbone scales), the refine 3x3s, and the output
        # projections. The top-down adds and mHC stay bf16.
        from ..ops.quant import quantize_tensor
        from .backbone import QuantConv, _maxabs

        ones = lambda: jnp.ones((), jnp.float32)  # noqa: E731
        feats = [features[k].astype(self.dtype) for k in SCALES]  # small, medium, large

        if self.quant_calib:
            for i, f in enumerate(feats):
                self.sow("quant_stats", f"lat{i}_scale", _maxabs(f))
        if self.act_quant:
            lat_scales = [
                self.variable("quant", f"lat{i}_scale", ones).value
                for i in range(3)
            ]
            laterals = [
                QuantConv(self.fpn_channels, (1, 1), out_dtype=self.dtype,
                          name=f"lateral{i}")(quantize_tensor(f, s), s)
                for i, (f, s) in enumerate(zip(feats, lat_scales))
            ]
        else:
            laterals = [
                nn.Conv(self.fpn_channels, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"lateral{i}")(f)
                for i, f in enumerate(feats)
            ]

        # Top-down pathway: large -> medium -> small.
        td = [None, None, None]
        td[2] = laterals[2]
        td[1] = laterals[1] + upsample2x(td[2])
        td[0] = laterals[0] + upsample2x(td[1])

        outputs: Dict[str, jax.Array] = {}
        out_names = ("fused_small", "fused_medium", "fused_large")
        for i, (name, out_ch) in enumerate(zip(out_names, self.out_channels)):
            if self.quant_calib:
                self.sow("quant_stats", f"td{i}_scale", _maxabs(td[i]))
            if self.act_quant:
                td_s = self.variable("quant", f"td{i}_scale", ones).value
                y = QuantConv(self.fpn_channels, (3, 3), out_dtype=self.dtype,
                              name=f"refine{i}")(quantize_tensor(td[i], td_s), td_s)
            else:
                y = nn.Conv(self.fpn_channels, (3, 3), use_bias=False,
                            dtype=self.dtype, name=f"refine{i}")(td[i])
            y = group_norm(self.fpn_channels, self.dtype)(y)
            y = nn.silu(y)
            if self.use_mhc:
                y = ManifoldHyperConnection(
                    dim=self.fpn_channels,
                    expansion_rate=1,
                    mlp_ratio=1,
                    sk_iters=self.sk_iters,
                    dropout_rate=self.dropout_rate,
                    dtype=self.dtype,
                    monitor=self.monitor,
                    precomputed_constraints=self.precomputed_constraints,
                    use_pallas=self.use_pallas,
                    name=f"mhc{i}",
                )(y, deterministic)
            if self.quant_calib:
                self.sow("quant_stats", f"y{i}_scale", _maxabs(y))
            if self.act_quant:
                y_s = self.variable("quant", f"y{i}_scale", ones).value
                outputs[name] = QuantConv(out_ch, (1, 1), out_dtype=self.dtype,
                                          name=f"out{i}")(quantize_tensor(y, y_s), y_s)
            else:
                outputs[name] = nn.Conv(out_ch, (1, 1), use_bias=False,
                                        dtype=self.dtype, name=f"out{i}")(y)
        return outputs


class MultiScaleFeatureFusion(nn.Module):
    """Resize-and-concat fusion to a single map at the smallest stride
    (reference: src/models/feature_fusion.py:156-253)."""

    out_channels: int = 256
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array]) -> jax.Array:
        small = features["scale_small"].astype(self.dtype)
        target_hw = small.shape[1:3]
        resized = [small]
        for k in ("scale_medium", "scale_large"):
            f = features[k].astype(self.dtype)
            f = jax.image.resize(
                f, (f.shape[0], target_hw[0], target_hw[1], f.shape[-1]), method="nearest"
            )
            resized.append(f)
        x = jnp.concatenate(resized, axis=-1)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = group_norm(self.out_channels, self.dtype)(x)
        return nn.silu(x)


class CrossScaleAttention(nn.Module):
    """All-pairs attention across scale summaries
    (reference: src/models/feature_fusion.py:256-360).

    Each scale is average-pooled to a summary vector; attention runs over the
    three summaries; the attended summaries gate the original maps channel-wise.
    One batched einsum — no per-pair Python loops.
    """

    channels: int = 256
    num_heads: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        keys = list(SCALES)
        summaries = []
        projected = {}
        for k in keys:
            f = features[k].astype(self.dtype)
            p = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"proj_{k}")(f)
            projected[k] = p
            summaries.append(jnp.mean(p.astype(jnp.float32), axis=(1, 2)))
        s = jnp.stack(summaries, axis=1).astype(self.dtype)  # [B, 3, C]

        head_dim = self.channels // self.num_heads
        b = s.shape[0]
        q = nn.Dense(self.channels, dtype=self.dtype, name="q")(s)
        k_ = nn.Dense(self.channels, dtype=self.dtype, name="k")(s)
        v = nn.Dense(self.channels, dtype=self.dtype, name="v")(s)
        split = lambda a: a.reshape(b, 3, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k_)).astype(jnp.float32)
        attn = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(head_dim)), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(self.dtype), split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, 3, self.channels)

        result = {}
        for i, key in enumerate(keys):
            gate = jax.nn.sigmoid(
                nn.Dense(self.channels, dtype=self.dtype, name=f"gate_{key}")(out[:, i])
            )
            result[key] = projected[key] * gate[:, None, None, :]
        return result


class AdaptiveFeatureFusion(nn.Module):
    """Learned softmax weighting over scales at a common resolution
    (reference: src/models/feature_fusion.py:363-455)."""

    out_channels: int = 256
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array]) -> jax.Array:
        keys = list(SCALES)
        target = features["scale_small"]
        target_hw = target.shape[1:3]
        maps = []
        for k in keys:
            f = features[k].astype(self.dtype)
            f = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"proj_{k}")(f)
            if f.shape[1:3] != target_hw:
                f = jax.image.resize(
                    f, (f.shape[0], target_hw[0], target_hw[1], self.out_channels),
                    method="nearest",
                )
            maps.append(f)
        weights = self.param("scale_weights", nn.initializers.zeros, (len(keys),), jnp.float32)
        w = jax.nn.softmax(weights).astype(self.dtype)
        stacked = jnp.stack(maps, axis=0)  # [3, B, H, W, C]
        return jnp.einsum("s,sbhwc->bhwc", w, stacked)
