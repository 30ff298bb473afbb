"""Int8 post-training quantization primitives for the serve path.

Why: the serve program is measured HBM-bandwidth-bound (artifacts/
ROOFLINE_r03.json: ~0.95-1.1 of the v5e 819 GB/s peak at every bucket, ridge
intensity 240 vs achieved 43-49 flops/byte), and the backbone accounts for 55%
of bytes (artifacts/BYTES_r03.json). On a bandwidth-bound program the lever is
moving FEWER bytes, not scheduling: storing the block-boundary activation
stream as int8 (1 byte/elt vs bf16's 2) halves the dominant traffic, and the
v5e MXU natively runs int8xint8->int32 at 2x bf16 peak throughput, so the
matmuls get cheaper too, never dearer.

Scheme (standard symmetric W8A8 PTQ, TPU-shaped):
  * activations: per-tensor symmetric scale, calibrated offline as
    max|x| over a calibration set (percentile optional), folded into the
    'quant' variables collection exactly like the precomputed mHC constraints
    ('constraints' collection, hvs_tpu/models/constraints.py) — zero runtime
    calibration cost, static scales, no data-dependent control flow under jit.
  * weights: per-output-channel symmetric scales computed inline from the
    (tiny) kernel at trace time — weights are <40 MB total, so re-deriving
    scales each call costs nothing against a 10 GB/batch activation stream,
    and checkpoints stay byte-identical with the float model (the 'params'
    tree is untouched; quantization is a pure serving transform).
  * accumulation: int32 (``preferred_element_type``), rescaled once per conv
    by (act_scale * w_scale_c / 127^2) in fp32, then bf16 for the nonlinear
    tail. GroupNorm/SiLU stay bf16/fp32 — norms are cheap and precision-
    critical; quantizing them buys bytes we already fused away.

The reference delegates all quantization to torch2trt/TensorRT int8
(reference: src/inference/engine.py:162-193, src/deployment/model_server.py:
217-262 — never implemented beyond config flags). This module is the
TPU-native equivalent, implemented rather than delegated.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

INT8_MAX = 127.0


def calib_maxabs(x: jax.Array) -> jax.Array:
    """Per-tensor max-abs in fp32 — the calibration statistic every quant
    site sows (one definition so a future change, e.g. percentile
    calibration, cannot silently diverge between backbone/FPN/head)."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


def quantize_tensor(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric per-tensor int8 quantization: q = round(x / scale * 127).

    ``scale`` is the calibrated max|x| (fp32 scalar). Zero/negative scales are
    clamped so an uncalibrated (identity-init) scale cannot produce inf/nan.
    """
    s = jnp.maximum(scale.astype(jnp.float32), 1e-8)
    q = jnp.round(x.astype(jnp.float32) * (INT8_MAX / s))
    return jnp.clip(q, -INT8_MAX, INT8_MAX).astype(jnp.int8)


def dequantize_tensor(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Inverse of :func:`quantize_tensor`."""
    s = jnp.maximum(scale.astype(jnp.float32), 1e-8)
    return (q.astype(jnp.float32) * (s / INT8_MAX)).astype(dtype)


def quantize_weight_per_channel(
    kernel: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8 weights for HWIO conv kernels.

    Returns ``(q_kernel int8 [..., C_out], w_scale fp32 [C_out])`` where
    ``w_scale`` is max|w| over all axes but the last. Dead channels (all-zero)
    get scale 1 so the dequant stays finite.
    """
    k32 = kernel.astype(jnp.float32)
    axes = tuple(range(kernel.ndim - 1))
    w_scale = jnp.max(jnp.abs(k32), axis=axes)
    w_scale = jnp.where(w_scale > 0, w_scale, 1.0)
    q = jnp.round(k32 * (INT8_MAX / w_scale))
    q = jnp.clip(q, -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, w_scale


def conv_int8(
    x_q: jax.Array,
    kernel: jax.Array,
    act_scale: jax.Array,
    *,
    strides: Sequence[int] = (1, 1),
    padding: str = "SAME",
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """int8 activation x fp kernel conv with int8 MXU accumulation.

    ``x_q`` is the int8 NHWC activation (quantized with ``act_scale``);
    ``kernel`` is the ORIGINAL float HWIO kernel from the checkpoint —
    per-channel weight quantization happens here so callers never manage a
    second weight tree. Output is dequantized fp (``out_dtype``).
    """
    k_q, w_scale = quantize_weight_per_channel(kernel)
    dn = jax.lax.conv_dimension_numbers(
        x_q.shape, k_q.shape, ("NHWC", "HWIO", "NHWC")
    )
    acc = jax.lax.conv_general_dilated(
        x_q,
        k_q,
        window_strides=tuple(strides),
        padding=padding,
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    a_s = jnp.maximum(act_scale.astype(jnp.float32), 1e-8)
    rescale = (a_s / INT8_MAX) * (w_scale / INT8_MAX)  # [C_out]
    return (acc.astype(jnp.float32) * rescale).astype(out_dtype)


def matmul_int8(
    x_q: jax.Array,
    w: jax.Array,
    act_scale: jax.Array,
    *,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """int8-activation x fp-weight matmul with int32 MXU accumulation.

    Dense analog of :func:`conv_int8` for the mHC matmul chain: ``x_q`` is the
    int8 activation ([..., K], quantized with per-tensor ``act_scale``), ``w``
    the ORIGINAL float [K, N] matrix (checkpoint weight or a precomputed
    constraint such as ``w1_folded``/``h_post``/``h_res``) — per-output-column
    weight quantization happens here, so callers never manage a second weight
    tree. Output is dequantized ``out_dtype``.
    """
    w32 = w.astype(jnp.float32)
    w_scale = jnp.max(jnp.abs(w32), axis=0)
    w_scale = jnp.where(w_scale > 0, w_scale, 1.0)
    w_q = jnp.clip(jnp.round(w32 * (INT8_MAX / w_scale)), -INT8_MAX, INT8_MAX
                   ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q,
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    a_s = jnp.maximum(act_scale.astype(jnp.float32), 1e-8)
    rescale = (a_s / INT8_MAX) * (w_scale / INT8_MAX)  # [N]
    return (acc.astype(jnp.float32) * rescale).astype(out_dtype)


def quantization_error(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Mean |x - dequant(quant(x))| — diagnostic for calibration quality."""
    q = quantize_tensor(x, scale)
    return jnp.mean(jnp.abs(x.astype(jnp.float32) - dequantize_tensor(q, scale, jnp.float32)))


# ---------------------------------------------------------------------------
# Calibration: turn sown 'quant_stats' maxabs values into the 'quant'
# variables collection (mirrors models/constraints.py::compute_constraints).
# ---------------------------------------------------------------------------


def build_quant_collection(
    stats: Dict[str, Any], margin: float = 1.0
) -> Dict[str, Any]:
    """Convert a sown ``quant_stats`` tree into the ``quant`` collection.

    ``sow`` wraps each value in a tuple (one entry per call site execution);
    entries were already max-reduced by the sow reduce_fn, so take the tuple
    max. ``margin`` scales the calibrated range (e.g. 0.99 percentile-ish
    tightening or >1 headroom).
    """

    def fold(node):
        out = {}
        for key, value in node.items():
            if isinstance(value, dict):
                sub = fold(value)
                if sub:
                    out[key] = sub
            elif isinstance(value, (tuple, list)):
                out[key] = jnp.asarray(
                    max(float(v) for v in value) * margin, jnp.float32
                )
            else:
                out[key] = jnp.asarray(float(value) * margin, jnp.float32)
        return out

    return fold(stats)


def merge_max_stats(trees: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Elementwise max over calibration-batch stat trees."""
    if not trees:
        return {}
    out = trees[0]
    for t in trees[1:]:
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.maximum(jnp.asarray(a), jnp.asarray(b)), out, t
        )
    return out


def merge_percentile_stats(
    trees: Sequence[Dict[str, Any]], percentile: float = 99.0
) -> Dict[str, Any]:
    """Per-site percentile over the calibration batches' max-abs values.

    Max-over-batches clips nothing but lets ONE outlier activation dilate the
    whole int8 range (every ordinary value then quantizes coarser). Taking a
    percentile of the per-batch maxima trades a little saturation on the
    outlier batch for finer resolution everywhere else — the standard PTQ
    calibration knob (scripts/quantize.py --calib-percentile)."""
    if not trees:
        return {}
    return jax.tree_util.tree_map(
        lambda *vals: jnp.percentile(
            jnp.stack([jnp.asarray(v) for v in vals]), percentile
        ),
        *trees,
    )
