"""Target assigners — static-shape replacements for the reference's
HybridAssigner / FrustumAssigner / DistAssigner / PointInBoxAssigner /
mmdet MaxIoUAssigner (core/bbox/assigners/*, SURVEY.md §2.5).

Conventions: assignment results are per-query flat GT indices into the
[B·M]-flattened padded GT arrays, with -1 = background. Labels follow from
the assigned GT. All functions take validity masks and batch ids instead of
per-sample python loops.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.geometry import (
    corners_3d, points_box_assignment_batched, axis_aligned_iou_2d,
)
from ..utils.containers import GroundTruth


def flatten_gt(gt: GroundTruth):
    b, m, _ = gt.boxes.shape
    boxes = gt.boxes.reshape(b * m, -1)
    labels = gt.labels.reshape(b * m)
    valid = gt.valid.reshape(b * m) & (labels >= 0)
    batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), m)
    return boxes, labels, valid, batch


def assign_point_in_box(
    query_xyz: jax.Array, query_batch: jax.Array, query_valid: jax.Array,
    gt: GroundTruth, extra_height: float = 0.0,
) -> jax.Array:
    """PointInBoxAssigner (point_assigner.py:9-59): query center inside a
    (height-enlarged) GT box → that GT; -1 otherwise."""
    boxes, labels, valid, batch = flatten_gt(gt)
    b7 = boxes[:, :7]
    if extra_height != 0.0:
        z = b7[:, 2] - extra_height * 0.5
        dz = b7[:, 5] + extra_height
        b7 = jnp.concatenate([b7[:, :2], z[:, None], b7[:, 3:5], dz[:, None], b7[:, 6:7]], axis=1)
    assign = points_box_assignment_batched(query_xyz, query_batch, b7, batch, valid)
    return jnp.where(query_valid, assign, -1)


def project_gt_boxes_2d(
    gt_boxes: jax.Array,     # [G, 7+]
    lidar2img: jax.Array,    # [G, 4, 4] per-GT projection (already batch-resolved)
    img_w: int,
    img_h: int,
) -> Tuple[jax.Array, jax.Array]:
    """Project 3D boxes to axis-aligned 2D boxes on one camera.

    Reference (hybrid_assigner.py:190-255) clips the corner convex hull to
    the canvas via shapely and boxes the result; ``hull_canvas_aabb`` is the
    exact vectorized equivalent (candidate-point method), so boxes whose
    hull crosses a canvas corner diagonally get the true clipped extent
    rather than the over-covering clamped AABB.
    Returns (bboxes_2d [G, 4] xyxy, valid [G]).
    """
    from ..ops.geometry import hull_canvas_aabb

    corners = corners_3d(gt_boxes[:, :7])  # [G, 8, 3]
    g = corners.shape[0]
    pts4 = jnp.concatenate([corners, jnp.ones((g, 8, 1), corners.dtype)], axis=-1)
    proj = jnp.einsum("gnd,gkd->gnk", pts4, lidar2img)  # [G, 8, 4]
    depth = proj[..., 2]
    any_front = jnp.any(depth > 1e-5, axis=1)
    z = jnp.clip(depth, 1e-5, 1e5)
    uv = jnp.stack([proj[..., 0] / z, proj[..., 1] / z], axis=-1)  # [G, 8, 2]
    bboxes, nonempty = hull_canvas_aabb(uv, float(img_w), float(img_h))
    valid = (
        any_front & nonempty
        & (bboxes[:, 2] > bboxes[:, 0]) & (bboxes[:, 3] > bboxes[:, 1])
    )
    return bboxes, valid


def max_iou_assign_2d(
    pred_boxes: jax.Array,   # [P, 4] xyxy
    pred_cam: jax.Array,     # [P] camera id of each prediction
    pred_batch: jax.Array,   # [P]
    pred_valid: jax.Array,   # [P]
    gt_boxes_2d: jax.Array,  # [Gf, 4] per-(gt, cam) projected boxes (flattened)
    gt_cam: jax.Array,       # [Gf]
    gt_batch: jax.Array,     # [Gf]
    gt_valid: jax.Array,     # [Gf]
    gt_index: jax.Array,     # [Gf] flat 3D-GT index each 2D box came from
    pos_iou_thr: float = 0.7,
    neg_iou_thr: float = 0.3,
    min_pos_iou: float = 0.3,
    match_low_quality: bool = True,
) -> jax.Array:
    """mmdet MaxIoUAssigner semantics per camera, vectorized over cameras.

    Returns per-pred assigned flat 3D-GT index (-1 = not positive).
    """
    iou = axis_aligned_iou_2d(pred_boxes, gt_boxes_2d)  # [P, Gf]
    mask = (
        pred_valid[:, None] & gt_valid[None, :]
        & (pred_cam[:, None] == gt_cam[None, :])
        & (pred_batch[:, None] == gt_batch[None, :])
    )
    iou = jnp.where(mask, iou, -1.0)
    best_iou = jnp.max(iou, axis=1)
    best_gt = jnp.argmax(iou, axis=1)
    assigned = jnp.where(best_iou >= pos_iou_thr, best_gt, -1)

    if match_low_quality:
        # every 2D gt claims its best pred if IoU ≥ min_pos_iou; later gts
        # (higher flat index) override earlier, matching mmdet's gt loop
        gf = gt_boxes_2d.shape[0]
        best_pred_per_gt = jnp.argmax(iou, axis=0)            # [Gf]
        best_iou_per_gt = jnp.max(iou, axis=0)
        qualify = best_iou_per_gt >= min_pos_iou
        order = jnp.arange(gf)
        # for each pred, the highest-index qualifying gt whose best pred is it
        claim = jnp.where(qualify, order, -1)
        p = pred_boxes.shape[0]
        winner = jax.ops.segment_max(
            claim, best_pred_per_gt, num_segments=p
        )
        assigned = jnp.where(winner >= 0, winner, assigned)
    return jnp.where(assigned >= 0, gt_index[assigned.clip(0)], -1)


def build_gt_boxes_2d(
    gt: GroundTruth,
    lidar2img: jax.Array,  # [B, cams, 4, 4]
    img_w: int,
    img_h: int,
):
    """Project every (gt, cam) pair → flattened 2D GT table for max_iou_assign_2d."""
    boxes, labels, valid, batch = flatten_gt(gt)
    num_cams = lidar2img.shape[1]
    gf = boxes.shape[0]
    mats = lidar2img[batch]  # [Gf, cams, 4, 4]
    all_boxes, all_valid = [], []
    for c in range(num_cams):
        b2, v2 = project_gt_boxes_2d(boxes, mats[:, c], img_w, img_h)
        all_boxes.append(b2)
        all_valid.append(v2 & valid)
    gt2d = jnp.concatenate(all_boxes)                       # [cams*Gf, 4]
    gt2d_valid = jnp.concatenate(all_valid)
    gt2d_cam = jnp.repeat(jnp.arange(num_cams, dtype=jnp.int32), gf)
    gt2d_batch = jnp.tile(batch, (num_cams,))
    gt2d_index = jnp.tile(jnp.arange(gf, dtype=jnp.int32), (num_cams,))
    return gt2d, gt2d_cam, gt2d_batch, gt2d_valid, gt2d_index


def assign_by_dist(
    query_xyz: jax.Array, query_logits: jax.Array,
    query_batch: jax.Array, query_valid: jax.Array,
    gt: GroundTruth, max_dist_per_class: Sequence[float],
) -> jax.Array:
    """DistAssigner (dist_assigner.py:8-139) with 1-class tasks: a query with
    predicted class c matches the nearest same-class GT center (BEV) within
    max_dist[c]."""
    boxes, labels, valid, batch = flatten_gt(gt)
    pred_label = jnp.argmax(query_logits, axis=-1)
    d = jnp.linalg.norm(
        query_xyz[:, None, :2] - boxes[None, :, :2], axis=-1
    )  # [Q, Gf]
    mask = (
        valid[None, :]
        & (query_batch[:, None] == batch[None, :])
        & (pred_label[:, None] == labels[None, :])
    )
    d = jnp.where(mask, d, jnp.inf)
    best = jnp.argmin(d, axis=1)
    best_d = jnp.min(d, axis=1)
    maxd = jnp.asarray(max_dist_per_class)[pred_label.clip(0, len(max_dist_per_class) - 1)]
    ok = query_valid & (best_d < maxd)
    return jnp.where(ok, best, -1)


def merge_assign(primary: jax.Array, secondary: jax.Array) -> jax.Array:
    """Fill backgrounds of ``primary`` with ``secondary``'s positives
    (merge_3d_2d_assign_result, hybrid_assigner.py:36-51)."""
    return jnp.where(primary >= 0, primary, secondary)


def hybrid_assign(
    query_xyz: jax.Array,
    query_batch: jax.Array,
    query_valid: jax.Array,
    preds_2d: jax.Array,        # [Q, 9] per-query 2D detections (or zeros)
    gt: GroundTruth,            # augmented GT (3D assignment)
    no_aug_gt: GroundTruth,     # no-aug GT (2D projection)
    lidar2img: jax.Array,       # [B, cams, 4, 4]
    img_w: int,
    img_h: int,
    query_logits: Optional[jax.Array] = None,
    max_dist_per_class: Optional[Sequence[float]] = None,
    extra_height: float = 0.0,
    restrict_3d_to_noaug: bool = False,
) -> jax.Array:
    """HybridAssigner (hybrid_assigner.py:53-107): 3D point-in-box primary,
    2D MaxIoU fills the background, optional distance assigner last.

    NOTE on GT index spaces: the 2D path projects the *no-aug* GT; we assume
    the padded no-aug and augmented GT tables are row-aligned per sample
    (same objects, different geometry), which the data pipeline guarantees —
    so indices merge directly.
    """
    gt3d = no_aug_gt if restrict_3d_to_noaug else gt
    a3d = assign_point_in_box(query_xyz, query_batch, query_valid, gt3d, extra_height)

    gt2d, gt2d_cam, gt2d_batch, gt2d_valid, gt2d_index = build_gt_boxes_2d(
        no_aug_gt, lidar2img, img_w, img_h
    )
    pred_boxes = preds_2d[:, :4]
    pred_cam = preds_2d[:, 6].astype(jnp.int32)
    has_2d = query_valid & (preds_2d[:, 8] > 0)
    a2d = max_iou_assign_2d(
        pred_boxes, pred_cam, query_batch, has_2d,
        gt2d, gt2d_cam, gt2d_batch, gt2d_valid, gt2d_index,
    )
    out = merge_assign(a3d, a2d)

    if query_logits is not None and max_dist_per_class is not None:
        adist = assign_by_dist(
            query_xyz, query_logits, query_batch, query_valid, gt, max_dist_per_class
        )
        out = merge_assign(out, adist)
    return jnp.where(query_valid, out, -1)
