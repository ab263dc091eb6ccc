"""2D RoIAlign + FPN multi-level RoI extraction — TPU-native.

Counterpart of mmcv ``RoIAlign`` / mmdet ``SingleRoIExtractor`` as used by
the reference's offline 2D pre-inference model (HTC config
``projects/configs/_base_/nuimages/htc_without_semantic_r50_fpn_1x_nuim.py``:
``roi_layer=dict(type='RoIAlign', output_size=7, sampling_ratio=0)``,
``featmap_strides=[4, 8, 16, 32]``).

TPU formulation: RoIAlign is bilinear row-gathers from an [H·W, C] flat
feature map — the same pattern as ops/dcn.py — batched over (roi, bin,
sample). All shapes static: fixed roi capacity with a ``valid`` mask
(invalid rois produce zeros). ``aligned=True`` semantics (mmcv default:
half-pixel offset), average pooling over sampling points.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _bilinear_rows(flat: jax.Array, h: int, w: int, ys: jax.Array,
                   xs: jax.Array) -> jax.Array:
    """flat [H·W, C]; ys/xs [...] float pixel coords → [..., C].

    Zero outside the map (mmcv RoIAlign clamps instead, but sampling points
    of in-canvas rois never leave the map by more than the half-pixel
    offset, which the clamp below reproduces).
    """
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    out = 0.0
    for dy, wyy in ((0, 1.0 - wy), (1, wy)):
        for dx, wxx in ((0, 1.0 - wx), (1, wx)):
            yi = jnp.minimum(y0.astype(jnp.int32) + dy, h - 1)
            xi = jnp.minimum(x0.astype(jnp.int32) + dx, w - 1)
            v = flat[yi * w + xi]
            out = out + v * (wyy * wxx)[..., None]
    return out


def roi_align(
    feat: jax.Array,        # [H, W, C]
    rois: jax.Array,        # [N, 4] xyxy in IMAGE pixels
    valid: jax.Array,       # [N] bool
    out_size: int,
    spatial_scale: float,   # 1/stride of this level
    sampling_ratio: int = 0,
) -> jax.Array:
    """mmcv-semantics RoIAlign → [N, out, out, C].

    ``sampling_ratio=0`` means adaptive: ⌈bin_h⌉ × ⌈bin_w⌉ samples per bin.
    Adaptive counts are data-dependent, so (like every static-shape choice
    in this library) we fix 2×2 samples per bin — mmcv's count for rois up
    to 2·out_size·stride px, and the standard Detectron2 default.
    """
    h, w, c = feat.shape
    n = rois.shape[0]
    ns = max(sampling_ratio, 2)
    r = rois * spatial_scale
    # aligned=True: continuous coords with half-pixel offset
    x1, y1, x2, y2 = r[:, 0] - 0.5, r[:, 1] - 0.5, r[:, 2] - 0.5, r[:, 3] - 0.5
    bw = (x2 - x1) / out_size
    bh = (y2 - y1) / out_size
    # sample grid: per bin, ns×ns points at fractions (i+.5)/ns
    fr = (jnp.arange(ns, dtype=feat.dtype) + 0.5) / ns         # [ns]
    by = jnp.arange(out_size, dtype=feat.dtype)                # [out]
    gy = (y1[:, None, None]
          + (by[None, :, None] + fr[None, None, :]) * bh[:, None, None]
          )                                                    # [N, out, ns]
    gx = (x1[:, None, None]
          + (by[None, :, None] + fr[None, None, :]) * bw[:, None, None])
    flat = feat.reshape(h * w, c)
    ys = gy[:, :, None, :, None]                               # [N,out,1,ns,1]
    xs = gx[:, None, :, None, :]                               # [N,1,out,1,ns]
    ys, xs = jnp.broadcast_arrays(ys, xs)
    samp = _bilinear_rows(flat, h, w, ys, xs)                  # [N,out,out,ns,ns,C]
    out = samp.mean(axis=(3, 4))
    return out * valid[:, None, None, None].astype(out.dtype)


def map_rois_to_levels(rois: jax.Array, num_levels: int,
                       finest_scale: int = 56) -> jax.Array:
    """mmdet SingleRoIExtractor level mapping (single_level_roi_extractor):
    level = floor(log2(sqrt(area) / finest_scale + 1e-6)), clamped."""
    scale = jnp.sqrt(jnp.maximum(
        (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 0.0))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def multilevel_roi_align(
    feats: Sequence[jax.Array],   # per level [Hl, Wl, C]
    strides: Sequence[int],
    rois: jax.Array,              # [N, 4] xyxy image px
    valid: jax.Array,             # [N]
    out_size: int,
) -> jax.Array:
    """SingleRoIExtractor: each roi pools from one pyramid level → [N,o,o,C].

    Every level is pooled for every roi (static shapes), then selected by
    the level map — 4× the FLOPs of the dynamic dispatch but branch-free;
    at N≤1k rois and o=7 this is MXU-noise next to the backbone.
    """
    lvl = map_rois_to_levels(rois, len(feats))
    out = None
    for li, (f, s) in enumerate(zip(feats, strides)):
        o = roi_align(f, rois, valid, out_size, 1.0 / s)
        sel = (lvl == li)[:, None, None, None].astype(o.dtype)
        out = o * sel if out is None else out + o * sel
    return out
