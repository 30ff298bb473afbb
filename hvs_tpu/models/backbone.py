"""Hybrid CNN backbone with channel-wise mHC, NHWC layout throughout.

TPU-native redesign of the reference backbone
(reference: src/models/vision_backbone.py:10-457). Design changes:

  * NHWC everywhere: the channel axis is trailing, so the mHC layer operates on
    it natively — the reference's permute/reshape dance
    (src/models/vision_backbone.py:117-128) disappears entirely.
  * GroupNorm instead of BatchNorm: no running statistics (purely functional
    train state), deterministic inference, robust to small per-device batches
    under data parallelism.
  * Bottleneck residual blocks with the channel mHC applied at the bottleneck
    width — keeps the backbone inside the documented 2-5M parameter budget
    (reference: src/tests/test_models.py:316-324) which the reference's own
    full-width-mHC-per-conv code cannot meet.
  * Strided 3x3 convs fold downsampling into the first block of each stage.

Stage layout matches the reference: 4 stages of [2, 3, 4, 2] blocks at
64/128/256/512 channels; outputs ``scale_small`` (128ch, stride 8),
``scale_medium`` (256ch, stride 16), ``scale_large`` (512ch, stride 32)
(reference: src/models/vision_backbone.py:251-287,329-397).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.quant import calib_maxabs, conv_int8, dequantize_tensor, quantize_tensor
from .layers import ManifoldHyperConnection, SqueezeExcite, group_norm

Dtype = Any


class QuantConv(nn.Module):
    """Drop-in int8 replacement for ``nn.Conv(use_bias=False)``.

    Declares the identical ``kernel`` param (same path, shape, init, fp32
    param dtype) so float checkpoints load unchanged; the call takes the
    int8-quantized activation + its calibrated scale and runs the conv with
    int32 MXU accumulation (hvs_tpu/ops/quant.py). Serving-only: no bias, no
    autodiff requirements.
    """

    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    out_dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x_q: jax.Array, act_scale: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x_q.shape[-1], self.features),
            jnp.float32,
        )
        return conv_int8(
            x_q, kernel, act_scale, strides=self.strides, out_dtype=self.out_dtype
        )


_maxabs = calib_maxabs  # calibration statistic (single definition in ops.quant)


class ConvMHCBlock(nn.Module):
    """Bottleneck residual block with channel-wise mHC + SE attention.

    1x1 reduce -> 3x3 (optionally strided) -> channel mHC at bottleneck width
    -> 1x1 expand -> SE gate -> residual add. The mHC sees the feature map as
    [B, H, W, C_mid] and acts on the trailing channel axis directly.
    (reference behaviors: ConvMHCLayer src/models/vision_backbone.py:10-134 +
    ResidualMHCLayer :137-196 fused into one TPU-friendly block.)
    """

    channels: int
    stride: int = 1
    bottleneck_ratio: float = 0.5
    sk_iters: int = 20
    use_mhc: bool = True
    use_se: bool = True
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16
    monitor: bool = False
    precomputed_constraints: bool = False
    use_pallas: bool = False
    act_quant: bool = False
    act_quant_mhc: bool = False
    quant_calib: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = x.astype(self.dtype)
        in_ch = x.shape[-1]
        mid = max(16, int(self.channels * self.bottleneck_ratio))

        # --- int8 serving path (see hvs_tpu/ops/quant.py). The block INPUT is
        # quantized once and shared by the reduce conv, the projection
        # shortcut, and (dequantized, fusing into the add) the identity
        # shortcut — so on the HBM-bound serve program the full-width residual
        # stream crosses HBM as int8, which is the entire point.
        if self.quant_calib:
            self.sow("quant_stats", "x_scale", _maxabs(x))
        if self.act_quant:
            ones = lambda: jnp.ones((), jnp.float32)  # noqa: E731
            x_scale = self.variable("quant", "x_scale", ones).value
            y1_scale = self.variable("quant", "y1_scale", ones).value
            y2_scale = self.variable("quant", "y2_scale", ones).value
            x_q = quantize_tensor(x, x_scale)
            y = QuantConv(mid, (1, 1), out_dtype=self.dtype, name="reduce")(
                x_q, x_scale
            )
        else:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="reduce")(x)
        y = group_norm(mid, self.dtype)(y)
        y = nn.silu(y)
        if self.quant_calib:
            self.sow("quant_stats", "y1_scale", _maxabs(y))
        if self.act_quant:
            y = QuantConv(
                mid, (3, 3), strides=(self.stride, self.stride),
                out_dtype=self.dtype, name="spatial",
            )(quantize_tensor(y, y1_scale), y1_scale)
        else:
            y = nn.Conv(
                mid, (3, 3), strides=(self.stride, self.stride), use_bias=False,
                dtype=self.dtype, name="spatial",
            )(y)
        y = group_norm(mid, self.dtype)(y)
        y = nn.silu(y)
        if self.use_mhc:
            y = ManifoldHyperConnection(
                dim=mid,
                expansion_rate=1,
                mlp_ratio=1,
                sk_iters=self.sk_iters,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                monitor=self.monitor,
                precomputed_constraints=self.precomputed_constraints,
                use_pallas=self.use_pallas,
                act_quant=self.act_quant_mhc,
                quant_calib=self.quant_calib,
                name="mhc",
            )(y, deterministic)
        if self.quant_calib:
            self.sow("quant_stats", "y2_scale", _maxabs(y))
        if self.act_quant:
            y = QuantConv(self.channels, (1, 1), out_dtype=self.dtype, name="expand")(
                quantize_tensor(y, y2_scale), y2_scale
            )
        else:
            y = nn.Conv(
                self.channels, (1, 1), use_bias=False, dtype=self.dtype, name="expand"
            )(y)

        # --- Fused serve tail: GN(y) -> SE gate -> +shortcut -> SiLU in ONE
        # elementwise map pass. GroupNorm is y*s + t once the group stats are
        # known, the SE pooled input is an affine function of those same
        # stats (mean of affine = affine of mean), and the SE gate is a
        # per-channel scalar — so the whole tail folds to
        # silu(y*(s*g) + (t*g) + shortcut), which XLA fuses into a single
        # read of y (+ shortcut) and one write. The standard path pays ~2
        # extra full-width map passes (normalize write + SE pool read) — pure
        # HBM bandwidth on the bound serve program (ROOFLINE_r04, util 0.88).
        # Serving-only: training keeps the standard per-step rounding.
        # HVS_FUSE_NORMS=0 restores the standard tail for A/B sweeps
        # (trace-time, like the Pallas gate knobs).
        import os as _os

        fused_tail = (
            deterministic
            and self.precomputed_constraints
            and not self.act_quant
            and not self.quant_calib
            and _os.environ.get("HVS_FUSE_NORMS", "1") != "0"
        )
        gn_out = group_norm(self.channels, self.dtype)
        if fused_tail:
            y32 = y.astype(jnp.float32)
            sp = tuple(range(1, y32.ndim - 1))
            ch_mean = jnp.mean(y32, axis=sp)
            ch_m2 = jnp.mean(jnp.square(y32), axis=sp)
            s, t = gn_out.affine_from_channel_stats(ch_mean, ch_m2)
            if self.use_se:
                pooled = ch_mean * s + t  # spatial mean of the normalized map
                g = SqueezeExcite(self.channels, dtype=self.dtype, name="se")(
                    pooled=pooled.astype(self.dtype), return_gates=True
                ).astype(jnp.float32)
                s = s * g
                t = t * g
            bshape = (y.shape[0],) + (1,) * (y.ndim - 2) + (self.channels,)
            if self.stride != 1 or in_ch != self.channels:
                sc = nn.Conv(
                    self.channels, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name="shortcut",
                )(x)
                sc32 = sc.astype(jnp.float32)
                sc_mean = jnp.mean(sc32, axis=sp)
                sc_m2 = jnp.mean(jnp.square(sc32), axis=sp)
                gn_sc = group_norm(self.channels, self.dtype)
                s2, t2 = gn_sc.affine_from_channel_stats(sc_mean, sc_m2)
                out = (
                    y32 * s.reshape(bshape) + t.reshape(bshape)
                    + sc32 * s2.reshape(bshape) + t2.reshape(bshape)
                )
            else:
                out = (
                    y32 * s.reshape(bshape) + t.reshape(bshape)
                    + x.astype(jnp.float32)
                )
            return nn.silu(out).astype(self.dtype)

        y = gn_out(y)
        if self.use_se:
            y = SqueezeExcite(self.channels, dtype=self.dtype, name="se")(y)

        if self.stride != 1 or in_ch != self.channels:
            if self.act_quant:
                shortcut = QuantConv(
                    self.channels, (1, 1), strides=(self.stride, self.stride),
                    out_dtype=self.dtype, name="shortcut",
                )(x_q, x_scale)
            else:
                shortcut = nn.Conv(
                    self.channels, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name="shortcut",
                )(x)
            shortcut = group_norm(self.channels, self.dtype)(shortcut)
        elif self.act_quant:
            shortcut = dequantize_tensor(x_q, x_scale, self.dtype)
        else:
            shortcut = x
        return nn.silu(y + shortcut)


class HybridVisionBackbone(nn.Module):
    """CNN backbone producing three detection scales (NHWC).

    Input [B, H, W, 3] -> {"scale_small": [B, H/8, W/8, 128],
                           "scale_medium": [B, H/16, W/16, 256],
                           "scale_large": [B, H/32, W/32, 512]}
    (channel/stride parity with reference src/models/vision_backbone.py:329-397).
    """

    base_channels: int = 32
    stage_blocks: Sequence[int] = (2, 3, 4, 2)
    stage_channels: Sequence[int] = (64, 128, 256, 512)
    sk_iters: int = 20
    use_mhc: bool = True
    use_se: bool = True
    dtype: Dtype = jnp.bfloat16
    monitor: bool = False
    precomputed_constraints: bool = False
    use_pallas: bool = False
    act_quant: bool = False
    act_quant_mhc: bool = False
    quant_calib: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> Dict[str, jax.Array]:
        x = x.astype(self.dtype)
        # Stem: two strided convs -> stride 4 (reference stem reaches /4 before stages).
        # stem1 keeps the float path (3 input channels — negligible bytes);
        # stem2's input is the largest activation in the network (H/2 x W/2 x
        # base), so it is the single best int8 site.
        x = nn.Conv(self.base_channels, (3, 3), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, name="stem1")(x)
        x = group_norm(self.base_channels, self.dtype)(x)
        x = nn.silu(x)
        if self.quant_calib:
            self.sow("quant_stats", "stem2_scale", _maxabs(x))
        if self.act_quant:
            stem2_scale = self.variable(
                "quant", "stem2_scale", lambda: jnp.ones((), jnp.float32)
            ).value
            x = QuantConv(
                self.stage_channels[0], (3, 3), strides=(2, 2),
                out_dtype=self.dtype, name="stem2",
            )(quantize_tensor(x, stem2_scale), stem2_scale)
        else:
            x = nn.Conv(self.stage_channels[0], (3, 3), strides=(2, 2), use_bias=False,
                        dtype=self.dtype, name="stem2")(x)
        x = group_norm(self.stage_channels[0], self.dtype)(x)
        x = nn.silu(x)

        outputs: Dict[str, jax.Array] = {}
        scale_names = {1: "scale_small", 2: "scale_medium", 3: "scale_large"}
        for stage_idx, (n_blocks, ch) in enumerate(
            zip(self.stage_blocks, self.stage_channels)
        ):
            for block_idx in range(n_blocks):
                stride = 2 if (block_idx == 0 and stage_idx > 0) else 1
                x = ConvMHCBlock(
                    channels=ch,
                    stride=stride,
                    sk_iters=self.sk_iters,
                    use_mhc=self.use_mhc,
                    use_se=self.use_se,
                    dtype=self.dtype,
                    monitor=self.monitor,
                    precomputed_constraints=self.precomputed_constraints,
                    use_pallas=self.use_pallas,
                    act_quant=self.act_quant,
                    act_quant_mhc=self.act_quant_mhc,
                    quant_calib=self.quant_calib,
                    name=f"stage{stage_idx + 1}_block{block_idx}",
                )(x, deterministic)
            if stage_idx in scale_names:
                outputs[scale_names[stage_idx]] = x
        return outputs

    def get_output_channels(self) -> Dict[str, int]:
        """Channel counts per scale (reference: vision_backbone.py:399-405)."""
        return {
            "scale_small": self.stage_channels[1],
            "scale_medium": self.stage_channels[2],
            "scale_large": self.stage_channels[3],
        }

    @staticmethod
    def compute_flops(input_size: Tuple[int, int] = (416, 416)) -> int:
        """Rough conv FLOPs estimate (reference: vision_backbone.py:415-457).

        Computed analytically from the static architecture; detailed per-op cost
        comes from ``jax.jit(...).lower(...).compile().cost_analysis()`` instead.
        """
        h, w = input_size
        flops = 0
        # stem
        flops += 2 * (h // 2) * (w // 2) * 3 * 32 * 9
        flops += 2 * (h // 4) * (w // 4) * 32 * 64 * 9
        strides = [4, 8, 16, 32]
        chans = [64, 128, 256, 512]
        blocks = [2, 3, 4, 2]
        for s, c, n in zip(strides, chans, blocks):
            hw = (h // s) * (w // s)
            mid = c // 2
            per_block = hw * (c * mid + mid * mid * 9 + mid * c) * 2
            flops += per_block * n
        return flops
