"""3D box geometry: the TPU-native replacement for mmdet3d's box structures
and CUDA geometry ops.

Box layout follows mmdet3d LiDARInstance3DBoxes convention used throughout the
reference: ``[x, y, z_bottom, dx, dy, dz, yaw(, vx, vy)]`` with the box origin
at the *bottom* center (gravity center = z_bottom + dz/2) and yaw rotating
around +z. Replaces:
  * ``points_in_boxes`` / ``points_in_boxes_cpu`` CUDA ops (reference usages:
    segmentation_head.py:225, sparse_cluster_head.py:389, point_assigner.py:37)
  * box corner/BEV computations
  * rotated BEV IoU (mmcv ``box_iou_rotated`` / iou3d) — used by NMS and the
    optional IoU loss branch.

Everything is vectorized, mask-friendly, and static-shaped.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gravity_center(boxes: jax.Array) -> jax.Array:
    """[N,7+] bottom-origin boxes → [N,3] gravity centers."""
    return jnp.stack(
        [boxes[..., 0], boxes[..., 1], boxes[..., 2] + boxes[..., 5] * 0.5], axis=-1
    )


def enlarge_boxes(boxes: jax.Array, extra_wlh, extra_height: float = 0.0) -> jax.Array:
    """Grow dims by extra_wlh (w,l,h in box frame) keeping gravity center fixed.

    Mirrors the reference's enlarged-box logic (roi extractor extra_wlh and
    assigner extra_height: dynamic_point_roi_extractor.py:30-60,
    point_assigner.py 'enlarge box by height').
    """
    extra = jnp.asarray(extra_wlh, boxes.dtype)
    dims = boxes[..., 3:6] + extra
    z = boxes[..., 2] - extra[..., 2] * 0.5 - extra_height * 0.5
    dz = dims[..., 2] + extra_height
    out = jnp.concatenate(
        [
            boxes[..., :2],
            z[..., None],
            dims[..., :2],
            dz[..., None],
            boxes[..., 6:],
        ],
        axis=-1,
    )
    return out


def rotate_points_z(points: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotate [...,3] (or [...,2]) points by angle around +z (broadcasting)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = points[..., 0] * c - points[..., 1] * s
    y = points[..., 0] * s + points[..., 1] * c
    if points.shape[-1] == 2:
        return jnp.stack([x, y], axis=-1)
    return jnp.stack([x, y, points[..., 2]], axis=-1)


def points_in_boxes(
    points: jax.Array, boxes: jax.Array, z_by_gravity: bool = True
) -> jax.Array:
    """Rotated-box membership matrix.

    Args:
      points: [N, 3]
      boxes:  [M, 7+] bottom-origin LiDAR boxes.
    Returns:
      [N, M] bool — point i inside box j. Matches mmdet3d ``points_in_boxes``
      (translate to box frame, inverse-rotate, axis-aligned compare; boundary
      inclusive on the low side, exclusive high — we use inclusive both sides
      with a tiny eps, adequate for assignment logic).
    """
    ctr = gravity_center(boxes)  # [M,3]
    rel = points[:, None, :] - ctr[None, :, :]  # [N,M,3]
    yaw = boxes[None, :, 6]
    local = rotate_points_z(rel, -yaw)
    half = boxes[None, :, 3:6] * 0.5
    eps = 1e-6
    inside = jnp.all(jnp.abs(local) <= half + eps, axis=-1)
    return inside


def points_box_assignment(
    points: jax.Array,
    boxes: jax.Array,
    boxes_valid: jax.Array,
) -> jax.Array:
    """Per-point index of (first) containing box, -1 if none.

    Reference's points_in_boxes returns the *first/last* hit per point; the
    shipped code only relies on whether some box contains the point and which
    (ties are rare — boxes seldom overlap). We take the lowest-index match.
    """
    inside = points_in_boxes(points, boxes) & boxes_valid[None, :]
    m = boxes.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    first = jnp.min(jnp.where(inside, idx[None, :], m), axis=1)
    return jnp.where(first == m, -1, first)


def points_box_assignment_batched(
    points: jax.Array,
    point_batch: jax.Array,
    boxes: jax.Array,
    box_batch: jax.Array,
    boxes_valid: jax.Array,
) -> jax.Array:
    """Per-point first containing box restricted to the point's batch element."""
    inside = (
        points_in_boxes(points, boxes)
        & boxes_valid[None, :]
        & (point_batch[:, None] == box_batch[None, :])
    )
    m = boxes.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    first = jnp.min(jnp.where(inside, idx[None, :], m), axis=1)
    return jnp.where(first == m, -1, first)


def box_corners_bev(boxes: jax.Array) -> jax.Array:
    """[N,7+] → [N,4,2] BEV corner polygons (counter-clockwise)."""
    dx, dy = boxes[..., 3], boxes[..., 4]
    # corners in box frame (ccw)
    sx = jnp.stack([dx, dx, -dx, -dx], axis=-1) * 0.5
    sy = jnp.stack([-dy, dy, dy, -dy], axis=-1) * 0.5
    local = jnp.stack([sx, sy], axis=-1)  # [N,4,2]
    rot = rotate_points_z(local, boxes[..., None, 6])
    return rot + boxes[..., None, :2]


def corners_3d(boxes: jax.Array) -> jax.Array:
    """[N,7+] → [N,8,3] 3D corners (bottom 4 then top 4, ccw in BEV)."""
    bev = box_corners_bev(boxes)  # [N,4,2]
    z0 = boxes[..., 2:3]
    z1 = boxes[..., 2:3] + boxes[..., 5:6]
    bot = jnp.concatenate([bev, jnp.broadcast_to(z0[..., None, :], bev.shape[:-1] + (1,))], -1)
    top = jnp.concatenate([bev, jnp.broadcast_to(z1[..., None, :], bev.shape[:-1] + (1,))], -1)
    return jnp.concatenate([bot, top], axis=-2)


# ---------------------------------------------------------------------------
# Rotated rectangle intersection (Sutherland–Hodgman with static buffers).
# Two convex quads intersect in a polygon of ≤ 8 vertices; we clip one quad
# against the 4 half-planes of the other using fixed-size (16-slot) buffers.
# ---------------------------------------------------------------------------


def _polygon_area(pts: jax.Array, n_valid: jax.Array, cap: int) -> jax.Array:
    """Shoelace area of first n_valid vertices of pts [cap,2] (batched ...)."""
    idx = jnp.arange(cap)
    valid = idx < n_valid[..., None]
    # wrap: vertex i connects to (i+1) mod n_valid. nxt is a static roll
    # except at the last valid vertex (wraps to 0) — a broadcast select,
    # NOT take_along_axis (dynamic minor-dim indexing is ~10× slower on
    # TPU; see docs/performance.md round-3 rules).
    wrap = (idx + 1) == n_valid[..., None]
    x, y = pts[..., 0], pts[..., 1]
    xn = jnp.where(wrap, x[..., :1], jnp.roll(x, -1, axis=-1))
    yn = jnp.where(wrap, y[..., :1], jnp.roll(y, -1, axis=-1))
    cross = x * yn - xn * y
    area = 0.5 * jnp.sum(jnp.where(valid, cross, 0.0), axis=-1)
    return jnp.abs(area)


def _clip_by_halfplane(pts, n_valid, a, b, c, cap):
    """Clip polygon (pts[...,cap,2], n_valid) by a*x+b*y+c >= 0."""
    idx = jnp.arange(cap)
    wrap = (idx + 1) == n_valid[..., None]
    d = a[..., None] * pts[..., 0] + b[..., None] * pts[..., 1] + c[..., None]
    # next-vertex = static roll, wrap-select at the last valid vertex
    d_n = jnp.where(wrap, d[..., :1], jnp.roll(d, -1, axis=-1))
    p_n = jnp.where(wrap[..., None], pts[..., :1, :], jnp.roll(pts, -1, axis=-2))
    inside = d >= 0
    inside_n = d_n >= 0
    # intersection point of edge (p, p_n) with the line
    t = d / jnp.where(jnp.abs(d - d_n) < 1e-12, 1e-12, d - d_n)
    inter = pts + t[..., None] * (p_n - pts)
    # each input edge emits: [keep current if inside] + [emit intersection if crossing]
    emit_cur = inside
    emit_int = inside != inside_n
    valid_edge = idx < n_valid[..., None]
    emit_cur &= valid_edge
    emit_int &= valid_edge
    # output slots: 2 per edge, compacted by cumsum
    out_count = emit_cur.astype(jnp.int32) + emit_int.astype(jnp.int32)
    offs = jnp.cumsum(out_count, axis=-1) - out_count
    new_n = jnp.sum(out_count, axis=-1)
    out = jnp.zeros(pts.shape[:-2] + (cap, 2), pts.dtype)
    # scatter current vertices
    tgt_cur = jnp.where(emit_cur, offs, cap - 1)
    tgt_int = jnp.where(emit_int, offs + emit_cur.astype(jnp.int32), cap - 1)

    def scat(out, tgt, vals, mask):
        vals = jnp.where(mask[..., None], vals, 0.0)
        # use one-hot matmul-free scatter per batch element via .at (works batched)
        return out.at[..., tgt, :].add(vals) if out.ndim == 2 else _batched_scatter(out, tgt, vals)

    if pts.ndim == 2:
        out = out.at[tgt_cur, :].add(jnp.where(emit_cur[..., None], pts, 0.0))
        out = out.at[tgt_int, :].add(jnp.where(emit_int[..., None], inter, 0.0))
    else:
        out = _batched_scatter(out, tgt_cur, jnp.where(emit_cur[..., None], pts, 0.0))
        out = _batched_scatter(out, tgt_int, jnp.where(emit_int[..., None], inter, 0.0))
    # slot cap-1 may have garbage accumulated from masked writes; it is only
    # read when new_n == cap, which cannot happen (≤8 verts in rect-rect clip).
    return out, jnp.minimum(new_n, cap - 1)


def _batched_scatter(out, tgt, vals):
    """out[..., tgt[...,i], :] += vals[..., i, :] for leading batch dims."""
    flat_out = out.reshape((-1,) + out.shape[-2:])
    flat_tgt = tgt.reshape((-1, tgt.shape[-1]))
    flat_val = vals.reshape((-1,) + vals.shape[-2:])

    def one(o, t, v):
        return o.at[t, :].add(v)

    return jax.vmap(one)(flat_out, flat_tgt, flat_val).reshape(out.shape)


def rotated_rect_intersection_area(c1: jax.Array, c2: jax.Array) -> jax.Array:
    """Intersection area of two BEV rectangles given as corner quads.

    Args:
      c1, c2: [..., 4, 2] corner polygons (ccw).
    Returns [...] areas.
    """
    cap = 16
    pad = jnp.zeros(c1.shape[:-2] + (cap - 4, 2), c1.dtype)
    pts = jnp.concatenate([c1, pad], axis=-2)
    n = jnp.full(c1.shape[:-2], 4, jnp.int32)
    # clip by each edge of c2: edge from v_i to v_{i+1}; inside = left side (ccw)
    for i in range(4):
        p = c2[..., i, :]
        q = c2[..., (i + 1) % 4, :]
        a = q[..., 1] - p[..., 1]
        b = p[..., 0] - q[..., 0]
        cc = -(a * p[..., 0] + b * p[..., 1])
        # ccw polygon: interior satisfies a*x+b*y+c <= 0 for this edge normal;
        # flip sign so >= 0 is inside
        pts, n = _clip_by_halfplane(pts, n, -a, -b, -cc, cap)
    return _polygon_area(pts, n, cap)


def _ensure_ccw(corners: jax.Array) -> jax.Array:
    """Make corner quads counter-clockwise (area > 0 under shoelace)."""
    x, y = corners[..., 0], corners[..., 1]
    xn = jnp.roll(x, -1, axis=-1)
    yn = jnp.roll(y, -1, axis=-1)
    area2 = jnp.sum(x * yn - xn * y, axis=-1)
    flipped = corners[..., ::-1, :]
    return jnp.where((area2 < 0)[..., None, None], flipped, corners)


def boxes_iou_bev(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Rotated BEV IoU matrix [N, M] (mmcv box_iou_rotated equivalent)."""
    c1 = _ensure_ccw(box_corners_bev(boxes1))  # [N,4,2]
    c2 = _ensure_ccw(box_corners_bev(boxes2))  # [M,4,2]
    n, m = boxes1.shape[0], boxes2.shape[0]
    c1b = jnp.broadcast_to(c1[:, None], (n, m, 4, 2))
    c2b = jnp.broadcast_to(c2[None, :], (n, m, 4, 2))
    inter = rotated_rect_intersection_area(c1b, c2b)
    a1 = boxes1[:, 3] * boxes1[:, 4]
    a2 = boxes2[:, 3] * boxes2[:, 4]
    union = a1[:, None] + a2[None, :] - inter
    return inter / jnp.maximum(union, 1e-8)


def boxes_iou_3d(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """3D IoU = BEV intersection × z-overlap / union (iou3d equivalent)."""
    c1 = _ensure_ccw(box_corners_bev(boxes1))
    c2 = _ensure_ccw(box_corners_bev(boxes2))
    n, m = boxes1.shape[0], boxes2.shape[0]
    inter_bev = rotated_rect_intersection_area(
        jnp.broadcast_to(c1[:, None], (n, m, 4, 2)),
        jnp.broadcast_to(c2[None, :], (n, m, 4, 2)),
    )
    z1lo, z1hi = boxes1[:, 2], boxes1[:, 2] + boxes1[:, 5]
    z2lo, z2hi = boxes2[:, 2], boxes2[:, 2] + boxes2[:, 5]
    zov = jnp.maximum(
        jnp.minimum(z1hi[:, None], z2hi[None, :]) - jnp.maximum(z1lo[:, None], z2lo[None, :]),
        0.0,
    )
    inter = inter_bev * zov
    v1 = boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5]
    v2 = boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5]
    union = v1[:, None] + v2[None, :] - inter
    return inter / jnp.maximum(union, 1e-8)


def axis_aligned_iou_2d(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """IoU of [N,4] vs [M,4] xyxy 2D boxes (mmdet bbox_overlaps equivalent)."""
    x1 = jnp.maximum(boxes1[:, None, 0], boxes2[None, :, 0])
    y1 = jnp.maximum(boxes1[:, None, 1], boxes2[None, :, 1])
    x2 = jnp.minimum(boxes1[:, None, 2], boxes2[None, :, 2])
    y2 = jnp.minimum(boxes1[:, None, 3], boxes2[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    a1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    a2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    union = a1[:, None] + a2[None, :] - inter
    return inter / jnp.maximum(union, 1e-8)


def hull_canvas_aabb(
    pts: jax.Array,   # [G, N, 2] projected points (N small, e.g. 8 corners)
    img_w: float,
    img_h: float,
):
    """AABB of conv(pts) ∩ [0,W]×[0,H], exactly, fully vectorized.

    Matches the reference's shapely convex-hull canvas clip
    (hybrid_assigner.py:190-255) without host calls: the extreme points of a
    convex region clipped to a rectangle are among (a) the input points that
    lie inside the canvas, (b) intersections of point-pair segments with the
    four canvas border lines (hull edges are a subset of all pairs, and
    interior chords stay inside the hull so they never over-extend), and
    (c) canvas corners that lie inside the hull (tested against every
    point triangle). Returns (bboxes [G,4] xyxy, nonempty [G]).
    """
    g, n, _ = pts.shape
    cands, valids = [], []

    # (a) original points inside the canvas
    inside = (
        (pts[..., 0] >= 0) & (pts[..., 0] <= img_w)
        & (pts[..., 1] >= 0) & (pts[..., 1] <= img_h)
    )
    cands.append(pts)
    valids.append(inside)

    # (b) all pair segments × 4 border lines
    ii, jj = jnp.triu_indices(n, k=1)
    a = pts[:, ii]  # [G, P, 2]
    b = pts[:, jj]
    d = b - a
    for axis, c, lo, hi in (
        (0, 0.0, 0.0, img_h), (0, float(img_w), 0.0, img_h),
        (1, 0.0, 0.0, img_w), (1, float(img_h), 0.0, img_w),
    ):
        other = 1 - axis
        denom = d[..., axis]
        t = (c - a[..., axis]) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        p_other = a[..., other] + t * d[..., other]
        ok = (
            (t >= 0.0) & (t <= 1.0) & (jnp.abs(denom) >= 1e-9)
            & (p_other >= lo) & (p_other <= hi)
        )
        pt = jnp.stack([jnp.full_like(p_other, c), p_other], axis=-1)
        if axis == 1:  # (x, y) ordering
            pt = pt[..., ::-1]
        cands.append(pt)
        valids.append(ok)

    # (c) canvas corners inside the hull: inside any triangle of points
    corners = jnp.array(
        [[0.0, 0.0], [img_w, 0.0], [0.0, img_h], [img_w, img_h]], pts.dtype
    )  # [4, 2]
    ti, tj, tk = jnp.stack(
        jnp.meshgrid(jnp.arange(n), jnp.arange(n), jnp.arange(n), indexing="ij"),
        0,
    ).reshape(3, -1)
    tri_ok = (ti < tj) & (tj < tk)
    pa, pb, pc = pts[:, ti], pts[:, tj], pts[:, tk]  # [G, T, 2]

    def cross(o, u, v):
        return ((u[..., 0] - o[..., 0]) * (v[..., 1] - o[..., 1])
                - (u[..., 1] - o[..., 1]) * (v[..., 0] - o[..., 0]))

    q = corners[None, :, None, :]  # [1, 4, 1, 2]
    s1 = cross(pa[:, None], pb[:, None], q)
    s2 = cross(pb[:, None], pc[:, None], q)
    s3 = cross(pc[:, None], pa[:, None], q)
    eps = 1e-6
    in_tri = ((s1 >= -eps) & (s2 >= -eps) & (s3 >= -eps)) | (
        (s1 <= eps) & (s2 <= eps) & (s3 <= eps)
    )
    corner_in = jnp.any(in_tri & tri_ok[None, None, :], axis=-1)  # [G, 4]
    cands.append(jnp.broadcast_to(corners[None], (g, 4, 2)))
    valids.append(corner_in)

    allc = jnp.concatenate(cands, axis=1)
    allv = jnp.concatenate(valids, axis=1)
    big = jnp.float32(1e9)
    x1 = jnp.min(jnp.where(allv, allc[..., 0], big), axis=1)
    y1 = jnp.min(jnp.where(allv, allc[..., 1], big), axis=1)
    x2 = jnp.max(jnp.where(allv, allc[..., 0], -big), axis=1)
    y2 = jnp.max(jnp.where(allv, allc[..., 1], -big), axis=1)
    nonempty = jnp.any(allv, axis=1)
    bboxes = jnp.stack([x1, y1, x2, y2], axis=1)
    return jnp.where(nonempty[:, None], bboxes, 0.0), nonempty
