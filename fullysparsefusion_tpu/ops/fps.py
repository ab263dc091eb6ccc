"""Furthest point sampling + ball grouping — TPU replacements for
mmdet3d ``furthest_point_sample`` and the SSG clustering alternative
(single_stage_fsd.py:25-29 fps, :985-1084 SSGAssigner; unused by the
shipped FSF configs but part of the assigner surface).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def furthest_point_sample(
    xyz: jax.Array, valid: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Indices of K FPS-selected points (starts from the first valid point).

    O(K·N) lax.scan — matches the CUDA op's semantics. Invalid points are
    never selected; if fewer than K valid points exist, selections repeat
    and the returned mask marks duplicates invalid.
    """
    n = xyz.shape[0]
    big = jnp.float32(1e10)
    d0 = jnp.where(valid, big, -1.0)  # invalid points get -inf-ish priority
    first = jnp.argmax(valid)         # first valid index

    def body(carry, _):
        dists, last = carry
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        dists = jnp.minimum(dists, jnp.where(valid, d, -1.0))
        nxt = jnp.argmax(dists)
        return (dists, nxt), last

    (_, _), picks = jax.lax.scan(
        body, (d0, first), None, length=k
    )
    # picks[0] == first; mark duplicates (ran out of valid points) invalid
    n_valid = jnp.sum(valid.astype(jnp.int32))
    sel_valid = jnp.arange(k) < n_valid
    return picks.astype(jnp.int32), sel_valid


def ball_group(
    xyz: jax.Array,        # [N, 3]
    valid: jax.Array,
    centers: jax.Array,    # [K, 3]
    centers_valid: jax.Array,
    radius: float,
) -> jax.Array:
    """Assign each point to the nearest center within ``radius`` (BEV),
    -1 otherwise (ssg_single_sample semantics)."""
    d = jnp.linalg.norm(xyz[:, None, :2] - centers[None, :, :2], axis=-1)
    d = jnp.where(centers_valid[None, :], d, jnp.inf)
    best = jnp.argmin(d, axis=1)
    best_d = jnp.min(d, axis=1)
    ok = valid & (best_d < radius)
    return jnp.where(ok, best, -1).astype(jnp.int32)


def ssg_cluster(
    xyz: jax.Array, batch_idx: jax.Array, valid: jax.Array,
    num_fps: int, radius: float,
) -> jax.Array:
    """FPS + ball grouping cluster labels (SSGAssigner alternative to CCL).

    Single-batch semantics per call; callers vmap/loop over batch. Returns
    [N] labels in [0, num_fps) or -1.
    """
    picks, sel_valid = furthest_point_sample(xyz, valid, num_fps)
    centers = xyz[picks]
    return ball_group(xyz, valid, centers, sel_valid, radius)
