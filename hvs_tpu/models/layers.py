"""Core model layers: Manifold-Constrained Hyper-Connections and friends.

TPU-native redesign of the reference's manifold layers
(reference: src/models/manifold_layers.py:104-455). Key differences from the
PyTorch original, all deliberate:

  * The Sinkhorn projection is the log-domain ``lax.fori_loop`` from
    :mod:`hvs_tpu.ops.sinkhorn` — it fuses into the surrounding jitted forward
    pass instead of running a 20-iteration Python loop per layer per step
    (reference hot spot: src/models/manifold_layers.py:64-77).
  * Stability telemetry (eigenvalue spectrum, signal ratio, DS error) is
    returned functionally through flax's ``sow`` mechanism into a ``stability``
    collection — no mutable buffers under jit
    (reference: src/models/manifold_layers.py:282-316 mutates registered buffers).
  * Precision policy: parameters live in fp32, activations compute in bf16,
    and the constraint math (Sinkhorn, eigvalsh) always runs fp32
    (reference: autocast block src/models/manifold_layers.py:247-248).
  * ``expansion_rate`` and ``mlp_ratio`` are decoupled so the layer can be
    budgeted to the documented parameter counts (backbone 2-5M, model 10-30M,
    reference: src/tests/test_models.py:316-324,544-562 — budgets the reference
    implementation itself cannot meet).

Parameter naming: the raw constrained matrices are ``H_pre_raw``/``H_post_raw``/
``H_res_raw`` inside modules named ``mhc*`` so the trainer's differential
gradient clipping can select them by path (reference selects by
``'mhc' in name or 'H_' in name``, src/training/mhc_trainer.py:342-383).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sinkhorn import sinkhorn_log, doubly_stochastic_error

Dtype = Any

# Xavier-uniform with small gain, mirroring the reference's init
# (src/models/manifold_layers.py:193-197: xavier_uniform gain=0.1).
def _h_init(gain: float = 0.1):
    return nn.initializers.variance_scaling(gain, "fan_avg", "uniform")


def _layernorm(x, scale, bias, eps: float = 1e-6):
    """LayerNorm with fp32 statistics over the trailing axis."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias


class GroupNorm(nn.Module):
    """Drop-in replacement for ``flax.linen.GroupNorm`` that can hand its
    affine form to the caller.

    GroupNorm is ``y = x*s + t`` with per-(batch, channel) vectors once the
    group statistics are known; exposing ``affine_from_channel_stats`` lets
    the serve path compute those vectors from ONE stats pass and fuse
    normalize + SE gating + residual add + SiLU into a single elementwise
    map pass (see ConvMHCBlock) — the serve program is HBM-bound, and each
    avoided full-map read/write is throughput (ROOFLINE_r04).

    Checkpoint-compatible with ``nn.GroupNorm``: the class name drives flax
    auto-naming ("GroupNorm_N"), and params are the same ``scale``/``bias``
    of shape (features,) in fp32. Numerics match flax: fp32 fast-variance
    statistics, fp32 normalize, cast to ``dtype`` at the end.
    """

    features: int
    num_groups: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )

    def affine_from_channel_stats(
        self, ch_mean: jax.Array, ch_m2: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """(s, t) with ``normalized = x*s + t``, from per-channel spatial
        means of x and x^2 (fp32, shape [B, C])."""
        b, c = ch_mean.shape
        g = self.num_groups
        gm = jnp.mean(ch_mean.reshape(b, g, c // g), axis=-1)
        gm2 = jnp.mean(ch_m2.reshape(b, g, c // g), axis=-1)
        gv = gm2 - jnp.square(gm)
        rs = jax.lax.rsqrt(gv + self.epsilon)
        s = self.scale[None, :] * jnp.repeat(rs, c // g, axis=-1)
        t = self.bias[None, :] - jnp.repeat(gm, c // g, axis=-1) * s
        return s, t

    def __call__(self, x: jax.Array) -> jax.Array:
        x32 = x.astype(jnp.float32)
        spatial = tuple(range(1, x32.ndim - 1))
        ch_mean = jnp.mean(x32, axis=spatial)
        ch_m2 = jnp.mean(jnp.square(x32), axis=spatial)
        s, t = self.affine_from_channel_stats(ch_mean, ch_m2)
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        return (x32 * s.reshape(shape) + t.reshape(shape)).astype(self.dtype)


def group_norm(channels: int, dtype) -> GroupNorm:
    """GroupNorm with the largest group count <= 8 that divides ``channels``."""
    groups = 8
    while channels % groups != 0:
        groups //= 2
    return GroupNorm(
        features=channels, num_groups=groups, dtype=dtype, epsilon=1e-5
    )


class RMSNorm(nn.Module):
    """Root-mean-square layer norm (reference: src/models/manifold_layers.py:437-455)."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.epsilon) * scale
        return y.astype(self.dtype)


class ManifoldHyperConnection(nn.Module):
    """mHC layer: constrained-residual MLP block.

    Math (reference: src/models/manifold_layers.py:104-280):
        H_pre  = sigmoid(H_pre_raw)        in [0, 1],  shape [D, nD]
        H_post = 2 * sigmoid(H_post_raw)   in [0, 2],  shape [nD, D]
        H_res  = Sinkhorn(H_res_raw)       doubly stochastic, shape [D, D]
        out = dropout(norm( x @ H_res + MLP(norm(x) @ H_pre) @ H_post ))

    H_res doubly stochastic => spectral radius <= 1 => the residual path is
    non-expansive, which is the stability guarantee of the architecture.

    Attributes:
        dim: feature dimension D (trailing axis).
        expansion_rate: n in the [D, nD] expansion.
        mlp_ratio: hidden multiplier of the inner MLP (reference hard-codes 2).
        sk_iters: Sinkhorn iterations (reference default 20).
        monitor: if True, sow stability metrics into the ``stability`` collection
            (apply with ``mutable=['stability']`` to retrieve). ``monitor_eigs``
            additionally computes the eigenvalue spectrum (costly; training only).
    """

    dim: int
    expansion_rate: int = 2
    mlp_ratio: int = 2
    hidden_dim: Optional[int] = None
    sk_iters: int = 20
    tau: float = 1.0
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.bfloat16
    monitor: bool = False
    monitor_eigs: bool = False
    precomputed_constraints: bool = False
    use_pallas: bool = False
    # int8 serving for the mHC matmul chain (W8A8, hvs_tpu/ops/quant.py):
    # activations cross HBM as int8 between the chain's matmuls, halving the
    # layer's dominant traffic on the bandwidth-bound serve program. Serving-
    # only (requires precomputed_constraints); quant_calib sows per-site
    # max-abs ranges on the float path for scripts/quantize.py.
    act_quant: bool = False
    quant_calib: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        d = self.dim
        hidden = self.hidden_dim or d * self.expansion_rate
        mlp_hidden = hidden * self.mlp_ratio
        h_pre_raw = self.param("H_pre_raw", _h_init(), (d, hidden), jnp.float32)
        h_post_raw = self.param("H_post_raw", _h_init(), (hidden, d), jnp.float32)
        h_res_raw = self.param("H_res_raw", _h_init(), (d, d), jnp.float32)
        # MLP + norm parameters are owned directly (not via nn.Dense) so the
        # fused Pallas path can consume the same tree.
        dense_init = nn.initializers.lecun_normal()
        w1 = self.param("mlp_in_kernel", dense_init, (hidden, mlp_hidden), jnp.float32)
        b1 = self.param("mlp_in_bias", nn.initializers.zeros, (mlp_hidden,), jnp.float32)
        w2 = self.param("mlp_out_kernel", dense_init, (mlp_hidden, hidden), jnp.float32)
        b2 = self.param("mlp_out_bias", nn.initializers.zeros, (hidden,), jnp.float32)
        ln1_s = self.param("norm_pre_scale", nn.initializers.ones, (d,), jnp.float32)
        ln1_b = self.param("norm_pre_bias", nn.initializers.zeros, (d,), jnp.float32)
        ln2_s = self.param("norm_post_scale", nn.initializers.ones, (d,), jnp.float32)
        ln2_b = self.param("norm_post_bias", nn.initializers.zeros, (d,), jnp.float32)

        if self.precomputed_constraints:
            # Serving fast path: the constrained matrices depend only on the
            # weights, so they are computed ONCE at model load (see
            # hvs_tpu.models.constraints.compute_constraints) and read from the
            # 'constraints' collection — the ~20 sequential Sinkhorn iterations
            # per layer vanish from the per-request critical path.
            h_pre_v = self.variable(
                "constraints", "h_pre", lambda: jax.nn.sigmoid(h_pre_raw)
            )
            h_post_v = self.variable(
                "constraints", "h_post", lambda: 2.0 * jax.nn.sigmoid(h_post_raw)
            )
            h_res_v = self.variable(
                "constraints",
                "h_res",
                lambda: sinkhorn_log(h_res_raw, n_iters=self.sk_iters, tau=self.tau),
            )
            # Folded H_pre @ W1 (linear-into-linear, see compute_constraints):
            # the serve chain starts with ONE [D, mlp_hidden] matmul instead
            # of [D, hidden] then [hidden, mlp_hidden].
            w1_folded_v = self.variable(
                "constraints",
                "w1_folded",
                lambda: jax.nn.sigmoid(h_pre_raw) @ w1,
            )
            w1_folded = w1_folded_v.value.astype(self.dtype)
            h_pre = h_pre_v.value.astype(self.dtype)
            h_post = h_post_v.value.astype(self.dtype)
            h_res32 = h_res_v.value
            h_res = h_res32.astype(self.dtype)
        else:
            w1_folded = None
            # Constrained matrices (fp32 math, cast to compute dtype for the matmuls).
            h_pre = jax.nn.sigmoid(h_pre_raw).astype(self.dtype)
            h_post = (2.0 * jax.nn.sigmoid(h_post_raw)).astype(self.dtype)
            h_res32 = sinkhorn_log(h_res_raw, n_iters=self.sk_iters, tau=self.tau)
            h_res = h_res32.astype(self.dtype)

        x_in = x.astype(self.dtype)

        if (
            self.use_pallas
            and self.precomputed_constraints
            and deterministic
            and not self.act_quant
            and self.expansion_rate == 1
            and self.mlp_ratio == 1
        ):
            from ..ops.pallas.mhc_pallas import (
                mhc_block_pallas_packed,
                mhc_pallas_min_batch,
                mhc_pallas_min_tokens,
                mhc_pallas_packed_supported,
            )

            n_tokens = 1
            for s in x_in.shape[:-1]:
                n_tokens *= s
            # Batch and token count are static under jit, so this picks the
            # faster path per serve bucket: the engine's latency buckets
            # (batch 1/2) compile pure-XLA programs, throughput buckets take
            # the kernel on its profitable sites (calibrated on chip —
            # PALLAS_GATE_r04.json, rationale on the gate functions).
            take_pallas = (
                mhc_pallas_packed_supported(d)
                and x_in.shape[0] >= mhc_pallas_min_batch()
                and n_tokens >= mhc_pallas_min_tokens()
            )
            import os as _os

            if _os.environ.get("HVS_PALLAS_LOG"):
                # Trace-time only (static shapes): one line per mHC call site
                # per compiled program — used by scripts/pallas_threshold_sweep.
                print(
                    f"[pallas-gate] shape={x_in.shape} d={d} "
                    f"tokens={n_tokens} pallas={take_pallas}",
                    flush=True,
                )
            if take_pallas:
                # Fused single-kernel path: whole chain in VMEM, one HBM
                # round-trip instead of ~6 (the serve program is HBM-bound;
                # sub-lane widths 32/64 — the byte-heavy backbone stages —
                # ride the token-packing trick, see ops/pallas/mhc_pallas.py).
                if x_in.ndim == 4:
                    # Token order (H, W, B): XLA's conv layouts on this path
                    # are {3,0,2,1} (physically [H, W, B, C]), so this
                    # transpose+reshape lowers to a free bitcast instead of
                    # the full-map relayout copy a (B, H, W) flattening costs
                    # on both sides of the kernel. Per-token math is order-
                    # invariant, so any flattening is equally correct.
                    b_, h_, w_, _ = x_in.shape
                    tokens = jnp.transpose(x_in, (1, 2, 0, 3)).reshape(-1, d)
                else:
                    tokens = x_in.reshape(-1, d)
                out = mhc_block_pallas_packed(
                    tokens, w1_folded_v.value, b1, w2, b2,
                    h_post_v.value, h_res_v.value,
                    ln1_s, ln1_b, ln2_s, ln2_b,
                )
                if x_in.ndim == 4:
                    out = out.reshape(h_, w_, b_, d).transpose((2, 0, 1, 3))
                else:
                    out = out.reshape(x_in.shape)
                return out.astype(self.dtype)

        # int8 serving path: per-site calibrated scales from the 'quant'
        # collection; activations quantize to int8 BETWEEN the chain's
        # matmuls (quantize fuses into the producer's epilogue, so the
        # intermediates cross HBM at 1 byte/elt instead of 2).
        int8_chain = self.act_quant and w1_folded is not None and deterministic
        if self.quant_calib:
            from ..ops.quant import calib_maxabs
        if int8_chain:
            from ..ops.quant import matmul_int8, quantize_tensor

            ones = lambda: jnp.ones((), jnp.float32)  # noqa: E731
            y1_s = self.variable("quant", "y1_scale", ones).value
            a1_s = self.variable("quant", "a1_scale", ones).value
            a2_s = self.variable("quant", "a2_scale", ones).value
            x_s = self.variable("quant", "x_scale", ones).value

        y = _layernorm(x_in, ln1_s, ln1_b).astype(self.dtype)
        if self.quant_calib:
            self.sow("quant_stats", "y1_scale", calib_maxabs(y))
        if int8_chain:
            y = matmul_int8(
                quantize_tensor(y, y1_s), w1_folded_v.value, y1_s,
                out_dtype=self.dtype,
            ) + b1.astype(self.dtype)
        elif w1_folded is not None:
            # Serve path: H_pre folded into W1 (one matmul, one fewer
            # intermediate activation round trip on the HBM-bound program).
            y = y @ w1_folded + b1.astype(self.dtype)
        else:
            y = y @ h_pre
            # MLP in expanded space (reference: hidden -> 2*hidden -> hidden, GELU).
            y = (y @ w1.astype(self.dtype)) + b1.astype(self.dtype)
        y = nn.gelu(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        if self.quant_calib:
            self.sow("quant_stats", "a1_scale", calib_maxabs(y))
        if int8_chain:
            y = matmul_int8(
                quantize_tensor(y, a1_s), w2, a1_s, out_dtype=self.dtype
            ) + b2.astype(self.dtype)
        else:
            y = (y @ w2.astype(self.dtype)) + b2.astype(self.dtype)
        y = nn.gelu(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        if self.quant_calib:
            self.sow("quant_stats", "a2_scale", calib_maxabs(y))
            self.sow("quant_stats", "x_scale", calib_maxabs(x_in))
        if int8_chain:
            y = matmul_int8(
                quantize_tensor(y, a2_s), h_post_v.value, a2_s,
                out_dtype=self.dtype,
            )
            res = matmul_int8(
                quantize_tensor(x_in, x_s), h_res32, x_s, out_dtype=self.dtype
            )
        else:
            y = y @ h_post
            res = x_in @ h_res

        out = res + y
        out = _layernorm(out, ln2_s, ln2_b).astype(self.dtype)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)

        if self.monitor:
            # Functional telemetry (replaces mutable buffers,
            # reference: src/models/manifold_layers.py:282-316).
            in_norm = jnp.mean(jnp.linalg.norm(x_in.astype(jnp.float32), axis=-1))
            out_norm = jnp.mean(jnp.linalg.norm(out.astype(jnp.float32), axis=-1))
            metrics = {
                "signal_ratio": out_norm / (in_norm + 1e-8),
                "ds_error": doubly_stochastic_error(h_res32),
                "row_sum_error": jnp.max(jnp.abs(jnp.sum(h_res32, axis=-1) - 1.0)),
                "col_sum_error": jnp.max(jnp.abs(jnp.sum(h_res32, axis=-2) - 1.0)),
            }
            if self.monitor_eigs:
                h_sym = 0.5 * (h_res32 + h_res32.T)
                eigs = jnp.linalg.eigvalsh(h_sym)
                metrics["max_eigenvalue"] = eigs[-1]
                metrics["min_eigenvalue"] = eigs[0]
            # Overwrite (not append) so repeated applies keep one entry per layer.
            self.sow("stability", "metrics", metrics, reduce_fn=lambda prev, cur: cur)

        return out


class SqueezeExcite(nn.Module):
    """SE-style channel attention (reference: src/models/vision_backbone.py:75-85)."""

    channels: int
    reduction: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: Optional[jax.Array] = None,
        pooled: Optional[jax.Array] = None,
        return_gates: bool = False,
    ) -> jax.Array:
        # x: [B, H, W, C]. The fused serve tail (ConvMHCBlock) supplies
        # ``pooled`` directly — the spatial mean of the normalized map is an
        # affine function of the GroupNorm statistics, so no second map pass
        # is needed — and consumes the raw gates. Param tree is identical in
        # both modes (the same two Dense layers, created in the same order).
        if pooled is None:
            pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        g = nn.Dense(self.channels // self.reduction, dtype=self.dtype)(pooled.astype(self.dtype))
        g = nn.silu(g)
        g = nn.Dense(self.channels, dtype=self.dtype)(g)
        g = jax.nn.sigmoid(g)
        if return_gates:
            return g
        return x * g


class MultiHeadManifoldAttention(nn.Module):
    """MHA whose Q/K/V/out projections are mHC layers
    (reference: src/models/manifold_layers.py:349-434, expansion_rate=2).

    Attention math runs in bf16 with fp32 softmax. Provided for API parity;
    the default ViT blocks use :class:`MHCTransformerBlock` (dense QKV + mHC FFN)
    which is cheaper and maps better onto the MXU.
    """

    dim: int
    num_heads: int = 8
    expansion_rate: int = 2
    mlp_ratio: int = 1
    sk_iters: int = 20
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.bfloat16
    precomputed_constraints: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        assert self.dim % self.num_heads == 0
        head_dim = self.dim // self.num_heads
        mhc = lambda name: ManifoldHyperConnection(
            dim=self.dim,
            expansion_rate=self.expansion_rate,
            mlp_ratio=self.mlp_ratio,
            sk_iters=self.sk_iters,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            precomputed_constraints=self.precomputed_constraints,
            use_pallas=self.use_pallas,
            name=name,
        )
        q = mhc("mhc_q")(x, deterministic)
        k = mhc("mhc_k")(x, deterministic)
        v = mhc("mhc_v")(x, deterministic)

        b, t, _ = q.shape
        split = lambda a: a.reshape(b, t, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(head_dim))
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        return mhc("mhc_out")(out, deterministic)


class QuantDense(nn.Module):
    """Drop-in int8 replacement for ``nn.Dense``: declares the identical
    ``kernel``/``bias`` params (same path, init, fp32 dtype) so float
    checkpoints load unchanged; the call takes the int8-quantized activation
    + its calibrated scale (hvs_tpu/ops/quant.py). Serving-only."""

    features: int
    out_dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x_q: jax.Array, act_scale: jax.Array) -> jax.Array:
        from ..ops.quant import matmul_int8

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x_q.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        out = matmul_int8(x_q, kernel, act_scale, out_dtype=self.out_dtype)
        return out + bias.astype(self.out_dtype)


class DenseAttention(nn.Module):
    """Standard multi-head self-attention (dense QKV, bf16 matmuls, fp32
    softmax). ``act_quant`` serves the QKV and output projections as W8A8
    with calibrated scales (attention math stays bf16/fp32 — softmax is
    precision-critical and its bytes are a rounding error at <=500 tokens)."""

    dim: int
    num_heads: int = 8
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.bfloat16
    act_quant: bool = False
    quant_calib: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        head_dim = self.dim // self.num_heads
        b, t, _ = x.shape
        if self.quant_calib:
            from ..ops.quant import calib_maxabs

            self.sow("quant_stats", "qkv_in_scale", calib_maxabs(x))
        if self.act_quant:
            from ..ops.quant import quantize_tensor

            ones = lambda: jnp.ones((), jnp.float32)  # noqa: E731
            qkv_s = self.variable("quant", "qkv_in_scale", ones).value
            proj_s = self.variable("quant", "proj_in_scale", ones).value
            qkv = QuantDense(3 * self.dim, out_dtype=self.dtype, name="qkv")(
                quantize_tensor(x, qkv_s), qkv_s
            )
        else:
            qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, t, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(head_dim))
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        if self.quant_calib:
            from ..ops.quant import calib_maxabs

            self.sow("quant_stats", "proj_in_scale", calib_maxabs(out))
        if self.act_quant:
            from ..ops.quant import quantize_tensor

            return QuantDense(self.dim, out_dtype=self.dtype, name="proj")(
                quantize_tensor(out, proj_s), proj_s
            )
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class MHCTransformerBlock(nn.Module):
    """Pre-norm transformer block with an mHC-stabilized residual
    (reference: src/models/vit_encoder_decoder.py:111-210).

    x = x + DenseAttention(norm(x)); then the FFN role is played by a full mHC
    layer (which carries its own doubly-stochastic residual, norms, dropout).
    """

    dim: int
    num_heads: int = 8
    expansion_rate: int = 1
    mlp_ratio: int = 2
    sk_iters: int = 20
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.bfloat16
    monitor: bool = False
    use_manifold_attention: bool = False
    precomputed_constraints: bool = False
    use_pallas: bool = False
    act_quant: bool = False
    quant_calib: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = x.astype(self.dtype)
        if self.use_manifold_attention:
            attn = MultiHeadManifoldAttention(
                dim=self.dim,
                num_heads=self.num_heads,
                sk_iters=self.sk_iters,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                precomputed_constraints=self.precomputed_constraints,
                use_pallas=self.use_pallas,
                name="attn",
            )(nn.LayerNorm(dtype=self.dtype)(x), deterministic)
        else:
            attn = DenseAttention(
                dim=self.dim,
                num_heads=self.num_heads,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                act_quant=self.act_quant,
                quant_calib=self.quant_calib,
                name="attn",
            )(nn.LayerNorm(dtype=self.dtype)(x), deterministic)
        x = x + attn
        return ManifoldHyperConnection(
            dim=self.dim,
            expansion_rate=self.expansion_rate,
            mlp_ratio=self.mlp_ratio,
            sk_iters=self.sk_iters,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            monitor=self.monitor,
            precomputed_constraints=self.precomputed_constraints,
            use_pallas=self.use_pallas,
            act_quant=self.act_quant,
            quant_calib=self.quant_calib,
            name="mhc_ffn",
        )(x, deterministic)
