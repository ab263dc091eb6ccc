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
    masks: jax.Array,       # [B, num_cams, H, W, num_cls] uint16 packed
) -> Tuple[jax.Array, jax.Array]:
    """Per-point instance ids + 2D scores: ([N, cams, cls] int32 ids,
    [N, cams, cls] f32 scores; id 0 = no instance).

    ``masks`` is CHANNEL-LAST PACKED uint16 ``[B, cams, H, W, cls]`` with
    value = id | score_u8 << 8 (data/masks.py pack_mask_scores): one pixel's
    class planes are contiguous, so the lookup is N·cams row gathers of
    2·cls bytes instead of N·cams·cls scalar gathers, and the instance
    score rides the same gather — the separate per-(point, class) score
    gather from the anno table was 1.31M scalar reads ≈ 10.2 ms on v5e.
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
    val = flat_masks[idx]                            # [N, C, cls] uint16
    val = jnp.where(valid[:, :, None], val, 0)
    ids = (val & 0xFF).astype(jnp.int32)
    scores = (val >> 8).astype(jnp.float32) * (1.0 / 255.0)
    return ids, scores


def points_in_mask_compact(
    xyz: jax.Array,         # [N, 3]
    batch_idx: jax.Array,   # [N]
    lidar2img: jax.Array,   # [B, num_cams, 4, 4]
    masks_flat: jax.Array,  # [B·num_cams·H·W, num_cls] uint16 packed FLAT
    img_h: int,
    img_w: int,
    k: int = 2,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`points_in_mask` restricted to the ≤ ``k`` cameras each point
    actually projects into: ([N, k, cls] ids, [N, k, cls] scores).

    The full form issues N·num_cams mask-row gathers, but a surround rig's
    point can only project into adjacent-camera overlap — with C cameras
    yaw-spaced 360/C apart, a point lies in cams i and i+1 iff its azimuth
    is within FOV/2 of both headings, and three headings would need
    2·(360/C) < FOV (false for nuScenes 6×64° and AV2 7×*; the reference's
    own overlap duplication is pairwise, FSF.py:260-297 double_overlap_pts).
    So gathering the k=2 lowest-index valid cameras per point is exact, at
    k/num_cams of the gather rows — the full-cam gather measured 12.55 ms
    vs ~4 ms compact at bench scale (tools/profile_fsd.py mask_sub).
    Downstream consumers (select_frustum_points' flat top-k,
    per_point_class_scores' best-cam select) are camera-count agnostic.

    TWO layout rules this implementation exists for (measured,
    tools/microbench_mask_gather.py, v5e 2026-08-20):
      * the projection runs as THREE [N, 4] @ [4, B·C] matmuls (u·z, v·z,
        z rows of every batch's matrices at once, own-batch selected by
        masking) — the per-point ``lidar2img[batch_idx]`` form materializes
        an [N, C, 4, 4] operand whose (4, 4) minor dims tile-pad 64× and
        cost 12.7 ms at batch 2 vs ~2 at batch 1 (where the 1-row gather
        folds into a broadcast);
      * ``masks_flat`` must be PRE-flattened — see CameraData.masks.
    """
    bc = lidar2img.shape[0] * lidar2img.shape[1]
    num_cams = lidar2img.shape[1]
    num_cls = masks_flat.shape[-1]
    n = xyz.shape[0]
    pts4 = jnp.concatenate([xyz, jnp.ones((n, 1), xyz.dtype)], axis=1)
    m_rows = lidar2img.reshape(bc, 4, 4)             # [BC, row, d]
    proj_u = pts4 @ m_rows[:, 0, :].T                # [N, BC] (u·z)
    proj_v = pts4 @ m_rows[:, 1, :].T
    depth = pts4 @ m_rows[:, 2, :].T
    z = jnp.clip(depth, 1e-5, 1e5)
    px = jnp.floor(proj_u / z).astype(jnp.int32)
    py = jnp.floor(proj_v / z).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, bc), 1)
    own = (col // num_cams) == batch_idx[:, None]
    valid = (
        own & (depth > 1e-3)
        & (px >= 0) & (px < img_w)
        & (py >= 0) & (py < img_h)
    )  # [N, BC]
    px = jnp.clip(px, 0, img_w - 1)
    py = jnp.clip(py, 0, img_h - 1)
    idx = (col * img_h + py) * img_w + px            # [N, BC] flat pixel

    # pick the k lowest-index VALID cams per point: k argmax/mask passes over
    # a [N, BC] score (same pattern as models/roi._topk_maxmask — lax.top_k
    # is slower for tiny k); one-hot column selects, no take_along_axis
    score = jnp.where(valid, bc - col, 0)            # 0 = invalid
    idx_sel, ok_sel = [], []
    for _ in range(k):
        c = jnp.argmax(score, axis=1)                         # [N]
        oh = col == c[:, None]
        ok_sel.append(jnp.max(score, axis=1) > 0)
        idx_sel.append(jnp.sum(jnp.where(oh, idx, 0), axis=1))
        score = jnp.where(oh, 0, score)
    idx_k = jnp.stack(idx_sel, axis=1)               # [N, k]
    ok_k = jnp.stack(ok_sel, axis=1)                 # [N, k]

    val = masks_flat[jnp.where(ok_k, idx_k, 0)]      # [N, k, cls] uint16
    val = jnp.where(ok_k[:, :, None], val, 0)
    ids = (val & 0xFF).astype(jnp.int32)
    scores = (val >> 8).astype(jnp.float32) * (1.0 / 255.0)
    return ids, scores
