"""Box ↔ regression-target coders.

``BasePointBBoxCoder`` matches the reference coder exactly
(core/bbox/coders/base_point_bbox_coder.py:36-82): targets are encoded
relative to a base point as [Δxyz, log(dims+eps), sin(yaw), cos(yaw), (vx,vy)].
code_size 10 for nuScenes (velocity), 8 for AV2.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

EPS = 1e-6


@dataclass(frozen=True)
class BasePointBBoxCoder:
    code_size: int = 10

    def encode(self, bboxes: jax.Array, base_points: jax.Array) -> jax.Array:
        """[N, 7|9|10] boxes + [N, 3] base points → [N, code_size] targets."""
        delta = bboxes[:, :3] - base_points
        log_dims = jnp.log(bboxes[:, 3:6] + EPS)
        yaw = bboxes[:, 6:7]
        target = jnp.concatenate(
            [delta, log_dims, jnp.sin(yaw), jnp.cos(yaw)], axis=1
        )
        if self.code_size == 10:
            vel = bboxes[:, 7:9]
            target = jnp.concatenate([target, vel], axis=1)
        return target

    def decode(
        self, reg_preds: jax.Array, base_points: jax.Array, detach_yaw: bool = False
    ) -> jax.Array:
        """[N, code_size] predictions + [N, 3] base points → [N, 7|9] boxes."""
        assert reg_preds.shape[1] == self.code_size
        vel = reg_preds[:, 8:10] if self.code_size == 10 else None
        dims = jnp.exp(reg_preds[:, 3:6]) - EPS
        xyz = reg_preds[:, :3] + base_points
        yaw = jnp.arctan2(reg_preds[:, 6:7], reg_preds[:, 7:8])
        if detach_yaw:
            yaw = jax.lax.stop_gradient(yaw)
        boxes = jnp.concatenate([xyz, dims, yaw], axis=1)
        if vel is not None:
            boxes = jnp.concatenate([boxes, vel], axis=1)
        return boxes


@dataclass(frozen=True)
class ABSPointBBoxCoder:
    """Absolute-coordinate coder variant (reference
    core/bbox/coders/abs_point_bbox_coder.py:8-84): centers are encoded as
    normalized absolute positions instead of offsets from the base point.
    Unused by the shipped configs; provided for config-surface parity."""

    code_size: int = 10
    xy_normalizer: float = 51.2
    z_normalizer: float = 5.0

    def encode(self, bboxes: jax.Array, base_points: jax.Array) -> jax.Array:
        norm = jnp.asarray(
            [self.xy_normalizer, self.xy_normalizer, self.z_normalizer],
            bboxes.dtype,
        )
        xyz = bboxes[:, :3] / norm
        log_dims = jnp.log(bboxes[:, 3:6] + EPS)
        yaw = bboxes[:, 6:7]
        target = jnp.concatenate([xyz, log_dims, jnp.sin(yaw), jnp.cos(yaw)], axis=1)
        if self.code_size == 10:
            target = jnp.concatenate([target, bboxes[:, 7:9]], axis=1)
        return target

    def decode(
        self, reg_preds: jax.Array, base_points: jax.Array, detach_yaw: bool = False
    ) -> jax.Array:
        norm = jnp.asarray(
            [self.xy_normalizer, self.xy_normalizer, self.z_normalizer],
            reg_preds.dtype,
        )
        vel = reg_preds[:, 8:10] if self.code_size == 10 else None
        xyz = reg_preds[:, :3] * norm
        dims = jnp.exp(reg_preds[:, 3:6]) - EPS
        yaw = jnp.arctan2(reg_preds[:, 6:7], reg_preds[:, 7:8])
        if detach_yaw:
            yaw = jax.lax.stop_gradient(yaw)
        boxes = jnp.concatenate([xyz, dims, yaw], axis=1)
        if vel is not None:
            boxes = jnp.concatenate([boxes, vel], axis=1)
        return boxes
