"""Dynamic voxelization with static shapes.

TPU replacement for mmdet3d's ``Voxelization`` in dynamic mode
(reference: single_stage_fsd.py:433-456 — floor-div into zyx coords, batch
prefix) and the 0.1 m pre-voxelization dedup (single_stage_fsd.py:585-605).
Dynamic mode never samples points — it only assigns voxel coordinates — so on
TPU it is a floor-div plus a static-capacity group-by (`unique_segments`).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from .segment import (
    SegmentInfo, unique_segments, unique_segments_dense, segment_mean,
)


def voxel_coords(
    xyz: jax.Array,
    voxel_size: Sequence[float],
    pc_range: Sequence[float],
) -> Tuple[jax.Array, jax.Array]:
    """Per-point integer voxel coords (x,y,z order) + in-range mask.

    Matches reference semantics: ``floor((p - range_min) / voxel_size)``;
    points outside [range_min, range_max) are flagged invalid.
    """
    vs = jnp.asarray(voxel_size, xyz.dtype)
    lo = jnp.asarray(pc_range[:3], xyz.dtype)
    hi = jnp.asarray(pc_range[3:6], xyz.dtype)
    coords = jnp.floor((xyz - lo) / vs).astype(jnp.int32)
    in_range = jnp.all((xyz >= lo) & (xyz < hi), axis=-1)
    return coords, in_range


def grid_dims(voxel_size: Sequence[float], pc_range: Sequence[float]) -> Tuple[int, int, int]:
    """Static (nx, ny, nz) grid extents."""
    import math

    return tuple(
        int(round((pc_range[i + 3] - pc_range[i]) / voxel_size[i])) for i in range(3)
    )


def linearize_coords(
    coords_xyz: jax.Array,
    batch_idx: jax.Array,
    dims_xyz: Tuple[int, int, int],
) -> jax.Array:
    """(batch, z, y, x) → single int32 key; row-major in (b, z, y, x).

    Grid sizes used here (nuScenes 512*512*40*batch, AV2 2048*2048*32*batch)
    stay below int32 range for batch ≤ 8 per shard; asserted statically.
    """
    nx, ny, nz = dims_xyz
    assert nx * ny * nz < 2**31, "voxel grid too large for int32 keys"
    x, y, z = coords_xyz[..., 0], coords_xyz[..., 1], coords_xyz[..., 2]
    key = ((batch_idx.astype(jnp.int32) * nz + z) * ny + y) * nx + x
    return key


def delinearize_coords(
    keys: jax.Array, dims_xyz: Tuple[int, int, int]
) -> Tuple[jax.Array, jax.Array]:
    """Inverse of linearize_coords → (coords_xyz [N,3], batch_idx [N])."""
    nx, ny, nz = dims_xyz
    x = keys % nx
    rest = keys // nx
    y = rest % ny
    rest = rest // ny
    z = rest % nz
    b = rest // nz
    return jnp.stack([x, y, z], axis=-1), b


def voxelize_points(
    xyz: jax.Array,
    batch_idx: jax.Array,
    valid: jax.Array,
    voxel_size: Sequence[float],
    pc_range: Sequence[float],
    capacity: int,
    batch_size: int = 0,
) -> Tuple[SegmentInfo, jax.Array, jax.Array, jax.Array]:
    """Dynamic voxelization: group points into voxels with static capacity.

    Returns (seg, coords_xyz, batch_of_voxel, coords_of_voxel_xyz):
      seg — SegmentInfo keyed by linearized (batch,z,y,x);
      coords_xyz — per-point voxel coords;
      voxel coords/batch recovered from unique keys (INVALID slots → 0).

    ``batch_size`` (static) bounds the key space: when given and the grid
    fits the dense-unique budget, the group-by runs sort-free
    (segment.unique_segments_dense); 0 keeps the sorted path.
    """
    from .sparse_conv import _use_dense_unique

    coords, in_range = voxel_coords(xyz, voxel_size, pc_range)
    ok = valid & in_range
    dims = grid_dims(voxel_size, pc_range)
    keys = linearize_coords(coords, batch_idx, dims)
    cells = batch_size * dims[0] * dims[1] * dims[2]
    if _use_dense_unique(cells):
        seg = unique_segments_dense(keys, ok, cells, capacity)
    else:
        seg = unique_segments(keys, ok, capacity)
    safe_keys = jnp.where(seg.seg_valid, seg.unique_keys, 0)
    vox_coords, vox_batch = delinearize_coords(safe_keys, dims)
    return seg, coords, vox_batch, vox_coords


def voxel_downsample(
    data: Dict[str, jax.Array],
    xyz: jax.Array,
    batch_idx: jax.Array,
    valid: jax.Array,
    voxel_size: Sequence[float],
    pc_range: Sequence[float],
    capacity: int,
) -> Tuple[Dict[str, jax.Array], jax.Array, jax.Array]:
    """Voxel-grid dedup by mean, as in pre_voxelize (single_stage_fsd.py:585-605).

    Every float array in ``data`` is mean-reduced per voxel. Returns
    (reduced dict, voxel batch idx [capacity], voxel valid mask [capacity]).
    """
    seg, _, vox_batch, _ = voxelize_points(
        xyz, batch_idx, valid, voxel_size, pc_range, capacity
    )
    out = {
        k: segment_mean(v, seg.seg_id, capacity, counts=seg.counts)
        for k, v in data.items()
    }
    return out, vox_batch, seg.seg_valid
