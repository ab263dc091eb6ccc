"""Synthetic scene fixture: a few boxes with sampled surface points plus
ground clutter — the CPU stand-in for nuScenes-mini (SURVEY.md §4 item b)."""
import numpy as np
import jax.numpy as jnp

from fullysparsefusion_tpu.utils.containers import PointBatch, GroundTruth


def make_scene(
    seed=0,
    batch_size=2,
    boxes_per_sample=3,
    pts_per_box=80,
    bg_points=400,
    n_cap=2048,
    max_gt=16,
    num_classes=10,
    point_dim=5,
    extent=10.0,
):
    rng = np.random.default_rng(seed)
    all_pts, all_batch = [], []
    gt_boxes = np.zeros((batch_size, max_gt, 10), np.float32)
    gt_labels = np.full((batch_size, max_gt), -1, np.int32)
    gt_valid = np.zeros((batch_size, max_gt), bool)

    for b in range(batch_size):
        for j in range(boxes_per_sample):
            cx, cy = rng.uniform(-extent, extent, 2)
            cz = rng.uniform(-1.5, -0.5)
            dx, dy, dz = rng.uniform(1.5, 4.0), rng.uniform(1.5, 3.0), rng.uniform(1.2, 2.0)
            yaw = rng.uniform(-np.pi, np.pi)
            label = rng.integers(0, num_classes)
            gt_boxes[b, j] = [cx, cy, cz, dx, dy, dz, yaw, 0, 0, 1]
            gt_labels[b, j] = label
            gt_valid[b, j] = True
            # sample points inside the box
            local = rng.uniform(-0.5, 0.5, (pts_per_box, 3)) * [dx, dy, dz]
            c, s = np.cos(yaw), np.sin(yaw)
            world = np.stack(
                [
                    local[:, 0] * c - local[:, 1] * s + cx,
                    local[:, 0] * s + local[:, 1] * c + cy,
                    local[:, 2] + cz + dz / 2,
                ],
                1,
            )
            extra = rng.random((pts_per_box, point_dim - 3)).astype(np.float32)
            all_pts.append(np.concatenate([world, extra], 1))
            all_batch.append(np.full(pts_per_box, b))
        bg = np.concatenate(
            [
                rng.uniform(-extent, extent, (bg_points, 2)),
                rng.uniform(-2.5, 2.5, (bg_points, 1)),
                rng.random((bg_points, point_dim - 3)),
            ],
            1,
        )
        all_pts.append(bg)
        all_batch.append(np.full(bg_points, b))

    pts = np.concatenate(all_pts).astype(np.float32)
    batch = np.concatenate(all_batch).astype(np.int32)
    n = len(pts)
    assert n <= n_cap, (n, n_cap)
    pad = n_cap - n
    pb = PointBatch(
        points=jnp.asarray(np.concatenate([pts, np.zeros((pad, point_dim), np.float32)])),
        batch_idx=jnp.asarray(np.concatenate([batch, np.zeros(pad, np.int32)])),
        valid=jnp.asarray(np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])),
    )
    gt = GroundTruth(
        boxes=jnp.asarray(gt_boxes), labels=jnp.asarray(gt_labels), valid=jnp.asarray(gt_valid)
    )
    return pb, gt
