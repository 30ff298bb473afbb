"""Vision Transformer encoder/decoder with mHC-stabilized blocks.

TPU-native redesign of the reference ViT stack
(reference: src/models/vit_encoder_decoder.py:11-520). The encoder bridges the
CNN's deepest scale (512ch at stride 32) into a token space (256-dim, 8 heads,
6 layers — reference ViTConfig src/config/model_config.py:181-254), and the
``HybridVisionEncoder`` broadcasts the cls summary back onto the spatial grid.

All token math is bf16 with fp32 softmax; position embeddings are resized by
bilinear interpolation when the input grid differs from the reference grid so
one parameter set serves 320/416/512/640 inputs with static per-resolution jits.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import DenseAttention, ManifoldHyperConnection, MHCTransformerBlock

Dtype = Any


class PatchEmbedding(nn.Module):
    """Conv patchify + cls token + learned position embeddings
    (reference: src/models/vit_encoder_decoder.py:11-108)."""

    dim: int = 256
    patch_size: int = 16
    reference_grid: int = 26  # 416 / 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        # images: [B, H, W, C] -> tokens [B, 1 + gh*gw, dim]
        b = images.shape[0]
        x = nn.Conv(
            self.dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="proj",
        )(images.astype(self.dtype))
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.dim)

        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, self.dim), jnp.float32)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, self.reference_grid * self.reference_grid + 1, self.dim),
            jnp.float32,
        )
        pos_grid = interpolate_pos_embed(pos, (self.reference_grid, self.reference_grid), (gh, gw))
        x = x + pos_grid[:, 1:].astype(self.dtype)
        cls_tok = (cls + pos_grid[:, :1]).astype(self.dtype)
        cls_tok = jnp.broadcast_to(cls_tok, (b, 1, self.dim))
        return jnp.concatenate([cls_tok, x], axis=1)


def interpolate_pos_embed(
    pos: jax.Array, src_grid: Tuple[int, int], dst_grid: Tuple[int, int]
) -> jax.Array:
    """Bilinear-resize grid position embeddings; cls position passes through
    (reference: vit_encoder_decoder.py pos-emb interpolation in HybridVisionEncoder)."""
    if src_grid == dst_grid:
        return pos
    cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
    d = grid_pos.shape[-1]
    grid = grid_pos.reshape(1, src_grid[0], src_grid[1], d)
    resized = jax.image.resize(grid, (1, dst_grid[0], dst_grid[1], d), method="bilinear")
    return jnp.concatenate([cls_pos, resized.reshape(1, -1, d)], axis=1)


class VisionTransformerEncoder(nn.Module):
    """Stack of pre-norm mHC transformer blocks
    (reference: src/models/vit_encoder_decoder.py:213-333)."""

    dim: int = 256
    depth: int = 6
    num_heads: int = 8
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
    def __call__(self, tokens: jax.Array, deterministic: bool = True) -> jax.Array:
        x = tokens.astype(self.dtype)
        for i in range(self.depth):
            x = MHCTransformerBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                sk_iters=self.sk_iters,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                monitor=self.monitor,
                use_manifold_attention=self.use_manifold_attention,
                precomputed_constraints=self.precomputed_constraints,
                use_pallas=self.use_pallas,
                act_quant=self.act_quant,
                quant_calib=self.quant_calib,
                name=f"block{i}",
            )(x, deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)


class VisionTransformerDecoder(nn.Module):
    """Query-based decoder: learned queries cross-attend into encoder tokens
    (reference: src/models/vit_encoder_decoder.py:336-406 — a stub there; here a
    real single-stack cross-attention decoder usable for auxiliary tasks)."""

    dim: int = 256
    depth: int = 2
    num_heads: int = 8
    num_queries: int = 64
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, memory: jax.Array, deterministic: bool = True) -> jax.Array:
        b = memory.shape[0]
        queries = self.param(
            "queries", nn.initializers.normal(0.02), (1, self.num_queries, self.dim), jnp.float32
        )
        x = jnp.broadcast_to(queries, (b, self.num_queries, self.dim)).astype(self.dtype)
        mem = memory.astype(self.dtype)
        head_dim = self.dim // self.num_heads
        for i in range(self.depth):
            # Self-attention over queries.
            x = x + DenseAttention(
                dim=self.dim, num_heads=self.num_heads, dropout_rate=self.dropout_rate,
                dtype=self.dtype, name=f"self_attn{i}",
            )(nn.LayerNorm(dtype=self.dtype)(x), deterministic)
            # Cross-attention into memory.
            y = nn.LayerNorm(dtype=self.dtype)(x)
            q = nn.Dense(self.dim, dtype=self.dtype, name=f"xq{i}")(y)
            k = nn.Dense(self.dim, dtype=self.dtype, name=f"xk{i}")(mem)
            v = nn.Dense(self.dim, dtype=self.dtype, name=f"xv{i}")(mem)
            split = lambda a: a.reshape(b, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)).astype(jnp.float32)
            logits = logits / jnp.sqrt(jnp.float32(head_dim))
            attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, split(v))
            out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.dim)
            x = x + nn.Dense(self.dim, dtype=self.dtype, name=f"xproj{i}")(out)
            # FFN.
            y = nn.LayerNorm(dtype=self.dtype)(x)
            y = nn.Dense(self.dim * 2, dtype=self.dtype)(y)
            y = nn.gelu(y)
            y = nn.Dense(self.dim, dtype=self.dtype)(y)
            x = x + y
        return nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)


class HybridVisionEncoder(nn.Module):
    """CNN <-> ViT bridge (reference: src/models/vit_encoder_decoder.py:409-520).

    Takes the backbone's ``scale_large`` map [B, H/32, W/32, 512], projects to
    token dim with a 1x1 conv, runs the transformer over the spatial tokens
    (plus cls), broadcasts the cls vector back over the grid, projects back to
    512 channels, and fuses with the input through an mHC layer.
    """

    cnn_channels: int = 512
    dim: int = 256
    depth: int = 6
    num_heads: int = 8
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
    def __call__(self, feat: jax.Array, deterministic: bool = True) -> jax.Array:
        b, h, w, c = feat.shape
        feat = feat.astype(self.dtype)
        x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_tokens")(feat)
        tokens = x.reshape(b, h * w, self.dim)

        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, self.dim), jnp.float32)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, 13 * 13 + 1, self.dim), jnp.float32
        )
        pos_r = interpolate_pos_embed(pos, (13, 13), (h, w))
        tokens = tokens + pos_r[:, 1:].astype(self.dtype)
        cls_tok = jnp.broadcast_to((cls + pos_r[:, :1]).astype(self.dtype), (b, 1, self.dim))
        tokens = jnp.concatenate([cls_tok, tokens], axis=1)

        tokens = VisionTransformerEncoder(
            dim=self.dim,
            depth=self.depth,
            num_heads=self.num_heads,
            sk_iters=self.sk_iters,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            monitor=self.monitor,
            use_manifold_attention=self.use_manifold_attention,
            precomputed_constraints=self.precomputed_constraints,
            use_pallas=self.use_pallas,
            act_quant=self.act_quant,
            quant_calib=self.quant_calib,
            name="encoder",
        )(tokens, deterministic)

        cls_out = tokens[:, :1]  # [B, 1, dim]
        grid_out = tokens[:, 1:].reshape(b, h, w, self.dim)
        # Broadcast the global cls summary back over the grid and combine.
        combined = grid_out + cls_out[:, :, None, :]
        back = nn.Conv(self.cnn_channels, (1, 1), dtype=self.dtype, name="to_cnn")(combined)
        fused = feat + back
        # Channel mHC fusion at a bottleneck width to stay in budget.
        fused = ManifoldHyperConnection(
            dim=self.cnn_channels,
            expansion_rate=1,
            mlp_ratio=1,
            sk_iters=self.sk_iters,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            monitor=self.monitor,
            precomputed_constraints=self.precomputed_constraints,
            use_pallas=self.use_pallas,
            act_quant=self.act_quant,
            quant_calib=self.quant_calib,
            name="mhc_fuse",
        )(fused, deterministic)
        return fused
