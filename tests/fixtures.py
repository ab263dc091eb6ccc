"""Synthetic scene fixture: a few boxes with sampled surface points plus
ground clutter — the CPU stand-in for nuScenes-mini (SURVEY.md §4 item b).
Also builds matching synthetic camera data (masks + annos + projections)."""
import numpy as np
import jax.numpy as jnp

from fullysparsefusion_tpu.utils.containers import PointBatch, GroundTruth
from fullysparsefusion_tpu.models.camera import CameraData


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


def make_lidar_scene(
    seed=0,
    n_cap=131072,
    max_gt=128,
    n_boxes=32,
    num_classes=10,
    point_dim=5,
    extent=50.0,
    n_rings=40,
    pts_per_ring=2200,
    n_walls=24,
    sweeps=10,
):
    """Surface-like scene matching real multi-sweep LiDAR occupancy.

    Real nuScenes frames are 2-D surfaces embedded in 3-D (ground + object
    shells + building facades), giving ~60k occupied 0.2 m voxels at stage 0
    but only 15–25k after the first stride-2 (ROADMAP perf profile). The
    volumetric ``make_scene`` clutter over-fills deep stages by ~4×; use
    this generator for nuScenes-scale benchmarks.
    """
    rng = np.random.default_rng(seed)
    # fixed surface sample sites, RE-SCANNED by every sweep with small
    # jitter — real aggregated sweeps pile ~2+ points into each 0.2 m voxel
    base_sites = []
    # ground: ring pattern (beam elevations → 1/r² ring density)
    n_ground = n_rings * pts_per_ring // 4
    r = extent * np.sqrt(rng.uniform(0.02, 1.0, n_ground))
    th = rng.uniform(-np.pi, np.pi, n_ground)
    base_sites.append(np.stack([
        r * np.cos(th), r * np.sin(th), rng.normal(-1.8, 0.03, n_ground)
    ], 1))
    # building facades: vertical planes at the scene edge
    for _ in range(n_walls):
        cx, cy = rng.uniform(-extent, extent, 2)
        yaw = rng.uniform(-np.pi, np.pi)
        L, H = rng.uniform(6, 20), rng.uniform(2, 6)
        n = int(L * H * 7)
        u = rng.uniform(-0.5, 0.5, n) * L
        z = rng.uniform(-1.8, -1.8 + H, n)
        base_sites.append(np.stack([
            cx + u * np.cos(yaw), cy + u * np.sin(yaw), z,
        ], 1))
    base = np.concatenate(base_sites)
    pts_list = []
    for s in range(sweeps):
        take = rng.random(len(base)) < 0.55  # partial visibility per sweep
        p = base[take] + rng.normal(0, 0.015, (int(take.sum()), 3))
        pts_list.append(p)

    gt_boxes = np.zeros((1, max_gt, 10), np.float32)
    gt_labels = np.full((1, max_gt), -1, np.int32)
    gt_valid = np.zeros((1, max_gt), bool)
    for j in range(n_boxes):
        cx, cy = rng.uniform(-extent * 0.9, extent * 0.9, 2)
        cz = rng.uniform(-1.8, -1.2)
        dxl, dyl, dzl = rng.uniform(1.5, 5.0), rng.uniform(1.5, 2.5), rng.uniform(1.2, 2.2)
        yaw = rng.uniform(-np.pi, np.pi)
        gt_boxes[0, j] = [cx, cy, cz, dxl, dyl, dzl, yaw, 0, 0, 1]
        gt_labels[0, j] = rng.integers(0, num_classes)
        gt_valid[0, j] = True
        # sample the SHELL of the box (two visible faces + roof patch)
        n = 350
        face = rng.integers(0, 3, n)
        u = rng.uniform(-0.5, 0.5, n)
        v = rng.uniform(-0.5, 0.5, n)
        lx = np.where(face == 0, u * dxl, np.where(face == 1, -dxl / 2, u * dxl))
        ly = np.where(face == 0, -dyl / 2, np.where(face == 1, u * dyl, v * dyl))
        lz = np.where(face < 2, (v + 0.5) * dzl, dzl)
        c, s = np.cos(yaw), np.sin(yaw)
        world = np.stack([
            lx * c - ly * s + cx, lx * s + ly * c + cy, lz + cz,
        ], 1)
        pts_list.append(world)

    xyz = np.concatenate(pts_list)
    if len(xyz) > n_cap:
        xyz = xyz[rng.permutation(len(xyz))[:n_cap]]
    extra = rng.random((len(xyz), point_dim - 3)).astype(np.float32)
    pts = np.concatenate([xyz, extra], 1).astype(np.float32)
    n = len(pts)
    pad = n_cap - n
    pb = PointBatch(
        points=jnp.asarray(np.concatenate([pts, np.zeros((pad, point_dim), np.float32)])),
        batch_idx=jnp.asarray(np.zeros(n_cap, np.int32)),
        valid=jnp.asarray(np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])),
    )
    gt = GroundTruth(
        boxes=jnp.asarray(gt_boxes), labels=jnp.asarray(gt_labels),
        valid=jnp.asarray(gt_valid),
    )
    return pb, gt


def with_noaug_channels(pb: PointBatch) -> PointBatch:
    """Append a copy of xyz as the last-3 'no-augmentation' channels
    (SaveNoAugPoints semantics for an un-augmented scene)."""
    pts = jnp.concatenate([pb.points, pb.points[:, :3]], axis=1)
    return pb.replace(points=pts)


def make_camera_data(
    pb: PointBatch,
    gt: GroundTruth,
    batch_size=2,
    num_cams=2,
    num_classes=10,
    img_h=64,
    img_w=96,
    max_anno=32,
    fx=40.0,
):
    """Synthetic cameras + instance masks consistent with the GT boxes.

    Cameras look along +x (cam 0) and −x (cam 1). Each valid GT box gets an
    anno row; its mask is a painted rectangle around the projected gravity
    center in whichever camera sees it.
    """
    cams = []
    for ci in range(num_cams):
        s = 1.0 if ci == 0 else -1.0
        # depth = s*x; u_h = fx*s*y + cx*(s*x); v_h = fx*z + cy*(s*x)
        P = np.array(
            [
                [s * img_w / 2, s * fx, 0, 0],
                [s * img_h / 2, 0, fx, 0],
                [s, 0, 0, 0],
                [0, 0, 0, 1],
            ],
            np.float32,
        )
        cams.append(P)
    lidar2img = np.broadcast_to(
        np.stack(cams)[None], (batch_size, num_cams, 4, 4)
    ).copy()

    masks = np.zeros((batch_size, num_cams, img_h, img_w, num_classes), np.uint8)
    anno = np.zeros((batch_size, max_anno, 9), np.float32)
    gtb = np.asarray(gt.boxes)
    gtl = np.asarray(gt.labels)
    gtv = np.asarray(gt.valid)
    for b in range(batch_size):
        row = 0
        for j in range(gtb.shape[1]):
            if not gtv[b, j] or row >= max_anno:
                continue
            cx, cy, cz = gtb[b, j, 0], gtb[b, j, 1], gtb[b, j, 2] + gtb[b, j, 5] / 2
            ci = 0 if cx > 0 else 1
            s = 1.0 if ci == 0 else -1.0
            depth = s * cx
            if depth < 0.5:
                continue
            u = int(img_w / 2 + fx * s * cy / depth)
            v = int(img_h / 2 + fx * cz / depth)
            if not (0 <= u < img_w and 0 <= v < img_h):
                continue
            r = max(3, int(fx * max(gtb[b, j, 3], gtb[b, j, 4]) / depth / 2))
            u0, u1 = max(0, u - r), min(img_w, u + r + 1)
            v0, v1 = max(0, v - r), min(img_h, v + r + 1)
            cls = int(gtl[b, j])
            masks[b, ci, v0:v1, u0:u1, cls] = row + 1
            anno[b, row] = [u0, v0, u1, v1, 0.9, cls, ci, row, 1]
            row += 1
    from fullysparsefusion_tpu.data.masks import pack_mask_scores

    return CameraData.build(
        pack_mask_scores(masks, anno), anno, lidar2img)
