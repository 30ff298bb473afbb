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

Measured on TPU v5e (flagship serve, batch 8 at 640x640): 13.42 ms with this
kernel vs 13.33 ms XLA — no net win, because the eligible mHC layers carry a
small fraction of the model's HBM traffic (the conv feature maps dominate).
Kept as a correct, tested opt-in (``use_pallas=True``); default off.
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
