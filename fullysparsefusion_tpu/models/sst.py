"""SST — single-stride sparse transformer backbone (the FSD variant).

The reference keeps the SST machinery in-tree as FSD's transformer backbone
alternative (middle_encoders/sst_input_layer_v2.py + the window ops in
ops/sst_ops.py; not used by the shipped FSF configs but part of the model
surface, SURVEY.md §2.2). This is its TPU-native form:

  voxelize → window partition (regular + half-shifted) → per-window
  multi-head attention over padded token slots (drop_info max-token
  bucketing) → FFN — repeated N blocks, alternating window alignment like
  Swin. Everything is static-shaped: windows are segments, tokens live in
  [windows_cap, max_tokens, C] tensors with masks.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.window import (
    window_partition, flat_to_window, window_to_flat, window_position_embedding,
)
from .layers import MLP


class WindowAttentionBlock(nn.Module):
    """Pre-LN window MHA + FFN over padded window tokens."""

    dim: int = 128
    num_heads: int = 8
    ffn_dim: int = 256

    @nn.compact
    def __call__(self, tokens: jax.Array, mask: jax.Array, train: bool = False):
        # tokens [W, T, C], mask [W, T]
        x = nn.LayerNorm()(tokens)
        attn_mask = mask[:, None, None, :]  # [W, 1, 1, T]
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            use_bias=True, deterministic=True,
        )(x, x, mask=attn_mask)
        tokens = tokens + y * mask[..., None]
        z = nn.LayerNorm()(tokens)
        z = nn.Dense(self.ffn_dim)(z)
        z = nn.gelu(z)
        z = nn.Dense(self.dim)(z)
        return tokens + z * mask[..., None]


class SSTBackbone(nn.Module):
    """Shifted-window sparse transformer over active voxels.

    Consumes voxel features + coords (the VFE output), returns per-voxel
    features on the same active set — a drop-in alternative to the sparse
    UNet for FSD's segmentor.
    """

    dim: int = 128
    num_blocks: int = 4
    num_heads: int = 8
    sparse_shape: Tuple[int, int, int] = (512, 512, 1)
    window_shape: Tuple[int, int, int] = (16, 16, 1)
    max_tokens: int = 128
    windows_cap: int = 1024

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,    # [cap, C]
        coords: jax.Array,   # [cap, 3]
        batch: jax.Array,
        valid: jax.Array,
        train: bool = False,
    ) -> jax.Array:
        x = nn.Dense(self.dim)(feats)
        x = x + window_position_embedding(
            coords, None, self.window_shape, self.dim
        )
        x = x * valid[:, None].astype(x.dtype)

        parts = [
            window_partition(
                coords, batch, valid, self.sparse_shape, self.window_shape,
                shift, self.windows_cap,
            )
            for shift in (False, True)
        ]
        for i in range(self.num_blocks):
            part = parts[i % 2]  # alternate regular/shifted windows
            tokens, mask = flat_to_window(x, part, valid, self.max_tokens)
            tokens = WindowAttentionBlock(
                dim=self.dim, num_heads=self.num_heads, ffn_dim=self.dim * 2,
                name=f"block_{i}",
            )(tokens, mask, train)
            x = window_to_flat(tokens, part, valid, self.max_tokens)
            x = x * valid[:, None].astype(x.dtype)
        return x
