"""SST window partitioning — region batching for sparse transformers.

Replaces the reference's SSTInputLayer(V2) + window ops
(middle_encoders/sst_input_layer_v2.py:40-330, ops/sst_ops.py window
functions: get_window_coors, flat2window/window2flat, the ``drop_info``
max-token bucketing at sst_ops.py:655-736). This is the repo's
sequence-length-bucketing machinery (SURVEY.md §5 long-context analog).

TPU-static design: windows are segments (``unique_segments``); tokens get
in-window positions via ``ingroup_indices``; each ``drop_info`` bucket is a
separate padded [windows_cap, max_tokens, C] tensor. Tokens beyond a
bucket's max_tokens are dropped — exactly the reference's drop semantics,
but with static shapes.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from .segment import SegmentInfo, unique_segments, ingroup_indices


class WindowPartition(NamedTuple):
    seg: SegmentInfo        # voxel → window grouping
    inner_idx: jax.Array    # [N] position of each voxel inside its window
    win_coords: jax.Array   # [N, 3] window coords per voxel
    tokens_per_win: jax.Array  # [win_cap] token counts


def window_partition(
    coords: jax.Array,      # [N, 3] voxel coords (x, y, z)
    batch: jax.Array,
    valid: jax.Array,
    sparse_shape: Tuple[int, int, int],   # (nx, ny, nz)
    window_shape: Tuple[int, int, int],   # (wx, wy, wz)
    shift: bool,
    windows_cap: int,
) -> WindowPartition:
    """Assign voxels to (optionally half-shifted) windows.

    Matches get_window_coors semantics (sst_ops.py:261+): the shifted
    variant offsets coordinates by half a window before integer division.
    """
    wx, wy, wz = window_shape
    off = jnp.asarray([wx // 2, wy // 2, wz // 2], jnp.int32) if shift else jnp.zeros(3, jnp.int32)
    shifted = coords + off
    win = shifted // jnp.asarray(window_shape, jnp.int32)
    nwx = (sparse_shape[0] + wx - 1) // wx + (1 if shift else 0)
    nwy = (sparse_shape[1] + wy - 1) // wy + (1 if shift else 0)
    nwz = (sparse_shape[2] + wz - 1) // wz + (1 if shift else 0)
    key = ((batch * nwz + win[:, 2]) * nwy + win[:, 1]) * nwx + win[:, 0]
    seg = unique_segments(key, valid, windows_cap)
    inner = ingroup_indices(jnp.where(valid, key, -1), valid)
    return WindowPartition(
        seg=seg, inner_idx=inner, win_coords=win, tokens_per_win=seg.counts
    )


def flat_to_window(
    feats: jax.Array,       # [N, C]
    part: WindowPartition,
    valid: jax.Array,
    max_tokens: int,
) -> Tuple[jax.Array, jax.Array]:
    """Scatter flat voxel features into [win_cap, max_tokens, C] + mask.

    Tokens with inner index ≥ max_tokens are dropped (drop_info semantics).
    """
    win_cap = part.seg.capacity
    c = feats.shape[-1]
    keep = valid & (part.inner_idx >= 0) & (part.inner_idx < max_tokens)
    w = jnp.where(keep, part.seg.seg_id, win_cap)
    t = jnp.where(keep, part.inner_idx, 0)
    out = jnp.zeros((win_cap + 1, max_tokens, c), feats.dtype)
    out = out.at[w, t].set(jnp.where(keep[:, None], feats, 0.0))
    mask = jnp.zeros((win_cap + 1, max_tokens), bool).at[w, t].set(keep)
    return out[:win_cap], mask[:win_cap]


def window_to_flat(
    win_feats: jax.Array,   # [win_cap, max_tokens, C]
    part: WindowPartition,
    valid: jax.Array,
    max_tokens: int,
) -> jax.Array:
    """Gather back to flat order; dropped tokens get zeros."""
    win_cap = part.seg.capacity
    keep = valid & (part.inner_idx >= 0) & (part.inner_idx < max_tokens)
    w = jnp.clip(part.seg.seg_id, 0, win_cap - 1)
    t = jnp.clip(part.inner_idx, 0, max_tokens - 1)
    out = win_feats[w, t]
    return out * keep[:, None].astype(out.dtype)


def window_position_embedding(
    coords: jax.Array,
    part: WindowPartition,
    window_shape: Tuple[int, int, int],
    embed_dim: int,
) -> jax.Array:
    """Sinusoidal in-window position features [N, embed_dim]
    (SST's positional encoding over in-window offsets)."""
    ws = jnp.asarray(window_shape, jnp.float32)
    local = (coords % jnp.asarray(window_shape, jnp.int32)).astype(jnp.float32)
    local = local / ws - 0.5
    half = embed_dim // 6 * 2
    freqs = jnp.exp(
        jnp.arange(half // 2, dtype=jnp.float32) * (-jnp.log(10000.0) / max(half // 2 - 1, 1))
    )
    outs = []
    for a in range(3):
        ang = local[:, a:a + 1] * freqs[None, :] * 2 * jnp.pi
        outs.append(jnp.sin(ang))
        outs.append(jnp.cos(ang))
    pe = jnp.concatenate(outs, axis=1)
    pad = embed_dim - pe.shape[1]
    if pad > 0:
        pe = jnp.concatenate([pe, jnp.zeros((pe.shape[0], pad), pe.dtype)], axis=1)
    return pe[:, :embed_dim]
