"""LiDAR→image projection and instance-mask lookup.

TPU-native replacement for the reference's projection + ``F.grid_sample``
nearest mask lookup (FSF.py:169-226 ``prj_points_2d``/``points_in_mask``):
points are projected through per-camera ``lidar2img`` matrices and the
per-class instance-id masks are read with integer gathers (nearest
neighbor — matching grid_sample(mode='nearest', align_corners=False)).

Masks are ``[B, num_cams, num_cls, H, W]`` integer tensors whose pixel value
is (anno row index + 1), 0 = background — exactly the PNGs produced by the
reference's offline HTC pre-inference (tools/mask_tools/save_mask_nusc.py).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def project_points_2d(
    xyz: jax.Array,        # [N, 3]
    lidar2img: jax.Array,  # [num_cams, 4, 4]
    img_h: int,
    img_w: int,
) -> Tuple[jax.Array, jax.Array]:
    """Project to normalized [0,1) image coords per camera.

    Returns (uv [num_cams, N, 2], valid [num_cams, N]) — valid requires
    depth > 1e-3 and the projection inside the image.
    """
    n = xyz.shape[0]
    pts4 = jnp.concatenate([xyz, jnp.ones((n, 1), xyz.dtype)], axis=1)
    proj = jnp.einsum("nd,ckd->cnk", pts4, lidar2img)  # [C, N, 4]
    depth = proj[..., 2]
    depth_ok = depth > 1e-3
    z = jnp.clip(depth, 1e-5, 1e5)
    u = proj[..., 0] / z / img_w
    v = proj[..., 1] / z / img_h
    in_img = (u > 0.0) & (u < 1.0) & (v > 0.0) & (v < 1.0)
    valid = depth_ok & in_img
    uv = jnp.stack([u, v], axis=-1)
    return uv, valid


def points_in_mask(
    xyz: jax.Array,         # [N, 3]
    batch_idx: jax.Array,   # [N]
    lidar2img: jax.Array,   # [B, num_cams, 4, 4]
    masks: jax.Array,       # [B, num_cams, num_cls, H, W] int
) -> jax.Array:
    """Per-point instance ids: [N, num_cams, num_cls] (0 = no instance).

    ``masks`` is CHANNEL-LAST uint8 ``[B, cams, H, W, cls]``: one pixel's
    class planes are contiguous, so the lookup is N·cams row gathers of
    ``cls`` bytes instead of N·cams·cls scalar gathers — measured 7× faster
    on v5e at nuScenes scale (75 → 11 ms).
    """
    b, num_cams, img_h, img_w, num_cls = masks.shape
    n = xyz.shape[0]
    pts4 = jnp.concatenate([xyz, jnp.ones((n, 1), xyz.dtype)], axis=1)
    # per-point projection through its own batch's matrices
    mats = lidar2img[batch_idx]                      # [N, C, 4, 4]
    proj = jnp.einsum("nd,nckd->nck", pts4, mats)    # [N, C, 4]
    depth = proj[..., 2]
    z = jnp.clip(depth, 1e-5, 1e5)
    u = proj[..., 0] / z
    v = proj[..., 1] / z
    px = jnp.floor(u).astype(jnp.int32)   # nearest under align_corners=False
    py = jnp.floor(v).astype(jnp.int32)
    valid = (
        (depth > 1e-3)
        & (px >= 0) & (px < img_w)
        & (py >= 0) & (py < img_h)
    )  # [N, C]
    px = jnp.clip(px, 0, img_w - 1)
    py = jnp.clip(py, 0, img_h - 1)
    flat_masks = masks.reshape(-1, num_cls)
    base = batch_idx[:, None] * num_cams + jnp.arange(num_cams)[None, :]
    idx = (base * img_h + py) * img_w + px           # [N, C]
    obj = flat_masks[idx]                            # [N, C, cls] uint8
    return jnp.where(valid[:, :, None], obj, 0).astype(jnp.int32)
