"""Fused mHC block as a Pallas TPU kernel — the bandwidth lever.

The flagship serve path is HBM-bandwidth-bound (measured: 11.2 GB moved per
batch-8 serve ≈ 13.6 ms at peak BW ≈ the 13.3 ms observed; MXU utilization
only ~16%). Each mHC layer is a chain of 6 matmuls + 2 layernorms + GELUs that
XLA executes as separate HLOs, writing the [tokens, d] activation to HBM
between every step.

This kernel runs the ENTIRE block per token tile with all weights resident in
VMEM:

    ln1 -> @H_pre -> dense+gelu -> dense+gelu -> @H_post -> + x@H_res -> ln2

One HBM read of x, one HBM write of out, weights loaded once and reused across
all grid steps — ~6 activation round-trips per layer eliminated.

Preconditions (checked by the wrapper; falls back to plain jnp otherwise):
  * serving path — constrained matrices precomputed (no Sinkhorn inside),
  * expansion_rate == 1 and mlp_ratio == 1 (all weight matrices are [d, d]),
  * d a multiple of 128 and <= 512 (weights fit VMEM: 5 x d x d bf16 <= 2.6 MB),
  * no dropout (deterministic inference).

Math identical to ManifoldHyperConnection.__call__ (bf16 matmuls with fp32
accumulation, fp32 layernorm statistics).

History: the original lane-width kernel (``mhc_block_pallas``) showed no net
win (13.42 vs 13.33 ms, batch 8 @640²) because the byte-heavy sub-lane
widths (d=32/64, the backbone's early stages) weren't eligible. The PACKED
variant below reaches them by folding channel width into the lane dimension
via token packing, and is the TPU serve default for throughput buckets:
871.8-875.0 FPS @640² batch 16 vs 796.1 pure-XLA. The batch-aware gate
(``mhc_pallas_min_batch``/``mhc_pallas_min_tokens``, calibrated on chip in
``artifacts/PALLAS_GATE_r04.json``) keeps latency buckets (batch 1/2) on
pure XLA where per-launch work is too small to amortize the kernel.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

TILE = 256  # token rows per grid step (multiple of the 16-row bf16 sublane)


def _layernorm(x32, scale, bias, eps=1e-6):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _mhc_kernel(
    x_ref, h_pre_ref, w1_ref, b1_ref, w2_ref, b2_ref, h_post_ref, h_res_ref,
    ln1_s_ref, ln1_b_ref, ln2_s_ref, ln2_b_ref, out_ref,
):
    """Rounding discipline matches the XLA std path exactly: every matmul
    accumulates fp32 on the MXU but rounds its OUTPUT to bf16, and bias/GELU
    run in bf16 — otherwise the two paths diverge visibly after the final
    LayerNorm whenever the pre-norm signal is small (e.g. near-uniform H_res
    at init makes x@H_res ~ 0 and LN amplifies any rounding difference)."""
    bf = jnp.bfloat16
    x = x_ref[:]  # [TILE, d] bf16

    y = _layernorm(x.astype(jnp.float32), ln1_s_ref[:], ln1_b_ref[:]).astype(bf)
    y = jnp.dot(y, h_pre_ref[:], preferred_element_type=jnp.float32).astype(bf)
    y = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32).astype(bf)
    y = jax.nn.gelu(y + b1_ref[:].astype(bf))
    y = jnp.dot(y, w2_ref[:], preferred_element_type=jnp.float32).astype(bf)
    y = jax.nn.gelu(y + b2_ref[:].astype(bf))
    y = jnp.dot(y, h_post_ref[:], preferred_element_type=jnp.float32).astype(bf)

    res = jnp.dot(x, h_res_ref[:], preferred_element_type=jnp.float32).astype(bf)
    out = _layernorm((res + y).astype(jnp.float32), ln2_s_ref[:], ln2_b_ref[:])
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def mhc_block_pallas(
    x: jax.Array,
    h_pre: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    h_post: jax.Array,
    h_res: jax.Array,
    ln1_scale: jax.Array,
    ln1_bias: jax.Array,
    ln2_scale: jax.Array,
    ln2_bias: jax.Array,
) -> jax.Array:
    """Fused mHC block. ``x``: [n_tokens, d] (n padded to TILE internally)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() == "cpu"  # CPU tests run interpreted

    n, d = x.shape
    n_pad = (TILE - n % TILE) % TILE
    x_p = jnp.pad(x, ((0, n_pad), (0, 0))) if n_pad else x
    total = x_p.shape[0]

    weights = [
        h_pre.astype(jnp.bfloat16),
        w1.astype(jnp.bfloat16),
        b1.astype(jnp.float32).reshape(1, d),
        w2.astype(jnp.bfloat16),
        b2.astype(jnp.float32).reshape(1, d),
        h_post.astype(jnp.bfloat16),
        h_res.astype(jnp.bfloat16),
        ln1_scale.astype(jnp.float32).reshape(1, d),
        ln1_bias.astype(jnp.float32).reshape(1, d),
        ln2_scale.astype(jnp.float32).reshape(1, d),
        ln2_bias.astype(jnp.float32).reshape(1, d),
    ]
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    grid = (total // TILE,)
    out = pl.pallas_call(
        _mhc_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [full() for _ in weights],
        out_specs=pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, d), x.dtype),
        interpret=interpret,
    )(x_p, *weights)
    return out[:n] if n_pad else out


def mhc_pallas_supported(d: int, expansion_rate: int, mlp_ratio: int) -> bool:
    return expansion_rate == 1 and mlp_ratio == 1 and d % 128 == 0 and d <= 512


# ---------------------------------------------------------------------------
# Packed fused kernel — covers the byte-heavy sub-lane widths (d = 32, 64).
#
# The original kernel above requires d % 128 == 0 (the TPU lane width), which
# excludes the backbone's stage-1/2 channel-mHC (bottleneck widths 32/64) —
# exactly where the HBM bytes are: measured on the flagship serve program at
# batch 16 @640², the mHC chains carry 46% of backbone bytes (5.38 GB/batch,
# probe in commit history) and the backbone is 56% of all serve traffic.
#
# Packing trick: view p = 128/d consecutive tokens as ONE 128-lane row
# ([N, d] -> [N/p, 128], a free reshape — trailing dims are contiguous), and
# lift every [d, d] weight to the block-diagonal [128, 128] constant
# kron(I_p, W). Per-token channel matmuls become one lane-aligned matmul.
# LayerNorm statistics become matmuls too, against A = kron(I_p, 11ᵀ/d):
#   mean = x @ A          (replicates each segment's mean across its lanes)
#   var  = ((x - mean)²) @ A
# 1/d is a power of two for every supported width, so the bf16 A-products
# x_i/d are EXACT (exponent shift); the means match the fp32 reduction up to
# f32 accumulation order. The variance squares round to bf16 before the MXU
# (~2⁻⁹ relative), which sits below the bf16 OUTPUT rounding of the layer —
# measured parity vs the XLA path is tested in tests/test_pallas_mhc.py.
#
# The same code serves d % 128 == 0 natively (p = 1, A = 11ᵀ/d), so every
# channel width the flagship uses (32/64/128/256) takes this one kernel.
# The serve chain starts from the folded W1 (H_pre @ W1, see
# models/constraints.py), one matmul fewer than the training-path math.
# Reference behavior being fused: src/models/manifold_layers.py:223-280.
# ---------------------------------------------------------------------------


def _mhc_packed_kernel(
    x_ref, w1f_ref, b1_ref, w2_ref, b2_ref, h_post_ref, h_res_ref,
    ln1_s_ref, ln1_b_ref, ln2_s_ref, ln2_b_ref, a_ref, out_ref,
    *, packed: bool,
):
    """Fused serve-path mHC on (optionally) packed rows. Rounding discipline
    matches the XLA path: bf16 matmul inputs, fp32 MXU accumulation, bf16
    between ops; LayerNorm statistics fp32. Packed rows compute segment stats
    via the A matmul (means exact — power-of-two products; variance squares
    round to bf16, below the layer's own bf16 output rounding); unpacked rows
    (d >= 128) use exact fp32 lane reductions."""
    bf = jnp.bfloat16
    f32 = jnp.float32
    eps = 1e-6
    x = x_ref[:]  # [TILE, D] bf16
    a = a_ref[:]  # [D, D] bf16 segment-averaging matrix

    def seg_layernorm(t_bf, scale, bias):
        if packed:
            mu = jnp.dot(t_bf, a, preferred_element_type=f32)
            xc = t_bf.astype(f32) - mu
            var = jnp.dot((xc * xc).astype(bf), a, preferred_element_type=f32)
        else:
            t32 = t_bf.astype(f32)
            mu = jnp.mean(t32, axis=-1, keepdims=True)
            xc = t32 - mu
            var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        return xc * jax.lax.rsqrt(var + eps) * scale + bias

    y = seg_layernorm(x, ln1_s_ref[:], ln1_b_ref[:]).astype(bf)
    y = jnp.dot(y, w1f_ref[:], preferred_element_type=f32).astype(bf)
    y = jax.nn.gelu(y + b1_ref[:].astype(bf))
    y = jnp.dot(y, w2_ref[:], preferred_element_type=f32).astype(bf)
    y = jax.nn.gelu(y + b2_ref[:].astype(bf))
    y = jnp.dot(y, h_post_ref[:], preferred_element_type=f32).astype(bf)

    res = jnp.dot(x, h_res_ref[:], preferred_element_type=f32).astype(bf)
    out = seg_layernorm(res + y, ln2_s_ref[:], ln2_b_ref[:])
    out_ref[:] = out.astype(out_ref.dtype)


def mhc_block_pallas_packed(
    x: jax.Array,
    w1_folded: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    h_post: jax.Array,
    h_res: jax.Array,
    ln1_scale: jax.Array,
    ln1_bias: jax.Array,
    ln2_scale: jax.Array,
    ln2_bias: jax.Array,
) -> jax.Array:
    """Fused serve-path mHC block. ``x``: [n_tokens, d] with d in
    {32, 64, 128, 256, 512}; returns [n_tokens, d] in x.dtype."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() == "cpu"  # CPU tests run interpreted

    n, d = x.shape
    assert mhc_pallas_packed_supported(d), f"unsupported mHC width {d}"
    p = 128 // d if d < 128 else 1
    big = d * p  # packed row width: 128, or d itself when d >= 128

    # Pad tokens to a whole number of packed tiles, then pack.
    tile = 512 if big <= 128 else 256
    chunk = tile * p
    n_pad = (chunk - n % chunk) % chunk
    x_p = jnp.pad(x, ((0, n_pad), (0, 0))) if n_pad else x
    rows = x_p.shape[0] // p
    x_packed = x_p.reshape(rows, big)

    bf = jnp.bfloat16
    eye = jnp.eye(p, dtype=jnp.float32)

    def lift(w):  # [d, d] -> block-diagonal [big, big]
        w32 = w.astype(jnp.float32)
        return (jnp.kron(eye, w32) if p > 1 else w32).astype(bf)

    def tilev(v, dtype=jnp.float32):  # [d] -> [1, big]
        v = v.astype(dtype)
        return (jnp.tile(v, p) if p > 1 else v).reshape(1, big)

    # Segment-averaging matrix: exact bf16 products (1/d is a power of two).
    a_mat = jnp.kron(eye, jnp.full((d, d), 1.0 / d, jnp.float32)).astype(bf)

    weights = [
        lift(w1_folded),
        tilev(b1),
        lift(w2),
        tilev(b2),
        lift(h_post),
        lift(h_res),
        tilev(ln1_scale),
        tilev(ln1_bias),
        tilev(ln2_scale),
        tilev(ln2_bias),
        a_mat,
    ]
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_mhc_packed_kernel, packed=p > 1),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, big), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [full() for _ in weights],
        out_specs=pl.BlockSpec(
            (tile, big), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, big), x.dtype),
        interpret=interpret,
    )(x_packed, *weights)
    out = out.reshape(rows * p, d)
    return out[:n] if n_pad else out


def mhc_pallas_packed_supported(d: int) -> bool:
    """Widths the packed kernel serves: sub-lane widths that divide the
    128-lane registers evenly, plus lane multiples up to the VMEM budget."""
    return (128 % d == 0 or d % 128 == 0) and d <= 512


def mhc_pallas_min_tokens() -> int:
    """Trace-time token-count threshold below which the fused kernel loses to
    XLA. The kernel trades ~6 HBM activation round-trips for one launch; on
    small maps the fixed launch cost and tile padding dominate the bytes saved.
    Token counts are static under jit, so each serve bucket independently
    compiles whichever path is faster for its shapes. HVS_PALLAS_MIN_TOKENS
    overrides for sweeps (see scripts/pallas_threshold_sweep.py)."""
    import os

    return int(os.environ.get("HVS_PALLAS_MIN_TOKENS", "8192"))


def mhc_pallas_min_batch() -> int:
    """Trace-time batch floor for the fused kernel, measured on chip
    (artifacts/PALLAS_GATE_r04.json, flagship @640 end-to-end serve):

        batch 16: 1.14-1.16 ms/frame Pallas vs 1.25 XLA   (kernel +9%)
        batch  4: 1.97-2.03           vs 2.46             (kernel +18%)
        batch  2: 2.58-2.76           vs 2.37-2.44        (kernel -10%)
        batch  1: 3.35-4.40           vs 2.84-3.19        (kernel -15%+)

    Token count alone cannot express this policy: the batch-2 stride-4 map
    (51.2k tokens) should stay on XLA while the batch-4 stride-8 map (25.6k)
    should take the kernel. Batch is static under jit, so the engine's
    latency buckets (1/2) compile pure-XLA programs and the throughput
    buckets (4/8/16) take the kernel, each automatically."""
    import os

    return int(os.environ.get("HVS_PALLAS_MIN_BATCH", "4"))


def apply_mhc_params_pallas(x: jax.Array, params: Dict, constraints: Dict
                            ) -> jax.Array:
    """Apply a fused mHC block from a layer's param/constraint subtrees
    (param names as declared by ManifoldHyperConnection)."""
    shape = x.shape
    d = shape[-1]
    tokens = x.reshape(-1, d)
    out = mhc_block_pallas(
        tokens,
        constraints["h_pre"],
        params["mlp_in_kernel"],
        params["mlp_in_bias"],
        params["mlp_out_kernel"],
        params["mlp_out_bias"],
        constraints["h_post"],
        constraints["h_res"],
        params["norm_pre_scale"],
        params["norm_pre_bias"],
        params["norm_post_scale"],
        params["norm_post_bias"],
    )
    return out.reshape(shape)
