"""Batch containers (static-shape replacements for the reference's
list-of-tensors batching)."""
from __future__ import annotations

import jax
from flax import struct


@struct.dataclass
class PointBatch:
    """Concatenated multi-sample point cloud with validity mask.

    points: [N, D] — xyz first; extra channels (intensity, Δt, no-aug xyz)
    follow, mirroring the reference's channel layout.
    """

    points: jax.Array   # [N, D] f32
    batch_idx: jax.Array  # [N] i32
    valid: jax.Array    # [N] bool

    @property
    def xyz(self) -> jax.Array:
        return self.points[:, :3]


@struct.dataclass
class GroundTruth:
    """Padded GT boxes.

    boxes: [B, M, 10] — (x, y, z_bottom, dx, dy, dz, yaw, vx, vy, vel_flag);
    vel_flag 1 for real objects, 0 for copy-pasted ones (zeroes the velocity
    loss, reference sparse_cluster_head_v2.py:425-432). 7- or 9-col inputs
    are padded by the data pipeline.
    """

    boxes: jax.Array   # [B, M, 10] f32
    labels: jax.Array  # [B, M] i32
    valid: jax.Array   # [B, M] bool
