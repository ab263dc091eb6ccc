"""Geometry oracles: shapely for polygon intersection, brute force for
points-in-boxes."""
import numpy as np
import jax.numpy as jnp
import pytest

from fullysparsefusion_tpu.ops.geometry import (
    points_in_boxes,
    points_box_assignment,
    box_corners_bev,
    boxes_iou_bev,
    boxes_iou_3d,
    axis_aligned_iou_2d,
    enlarge_boxes,
    gravity_center,
)


def _np_points_in_box(pts, box):
    cx, cy, cz = box[0], box[1], box[2] + box[5] / 2
    rel = pts - np.array([cx, cy, cz])
    c, s = np.cos(-box[6]), np.sin(-box[6])
    lx = rel[:, 0] * c - rel[:, 1] * s
    ly = rel[:, 0] * s + rel[:, 1] * c
    lz = rel[:, 2]
    return (
        (np.abs(lx) <= box[3] / 2 + 1e-6)
        & (np.abs(ly) <= box[4] / 2 + 1e-6)
        & (np.abs(lz) <= box[5] / 2 + 1e-6)
    )


@pytest.mark.parametrize("seed", [0, 7])
def test_points_in_boxes_oracle(seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-10, 10, size=(200, 3)).astype(np.float32)
    boxes = np.stack(
        [
            rng.uniform(-8, 8, 5),
            rng.uniform(-8, 8, 5),
            rng.uniform(-2, 0, 5),
            rng.uniform(1, 6, 5),
            rng.uniform(1, 6, 5),
            rng.uniform(1, 3, 5),
            rng.uniform(-np.pi, np.pi, 5),
        ],
        axis=1,
    ).astype(np.float32)
    got = np.asarray(points_in_boxes(jnp.asarray(pts), jnp.asarray(boxes)))
    for j in range(5):
        np.testing.assert_array_equal(got[:, j], _np_points_in_box(pts, boxes[j]))


def test_points_box_assignment():
    boxes = jnp.asarray(
        [[0, 0, 0, 2, 2, 2, 0.0], [5, 5, 0, 2, 2, 2, 0.0]], jnp.float32
    )
    pts = jnp.asarray([[0, 0, 1], [5, 5, 1], [9, 9, 1]], jnp.float32)
    got = np.asarray(points_box_assignment(pts, boxes, jnp.ones(2, bool)))
    np.testing.assert_array_equal(got, [0, 1, -1])
    # invalid box 1 → point 1 unassigned
    got = np.asarray(points_box_assignment(pts, boxes, jnp.asarray([True, False])))
    np.testing.assert_array_equal(got, [0, -1, -1])


def _np_clip_area(subject, clip):
    """Independent Sutherland–Hodgman on python lists (test oracle)."""
    def clip_edge(poly, p1, p2):
        out = []
        n = len(poly)
        for i in range(n):
            cur, nxt = poly[i], poly[(i + 1) % n]
            side = lambda p: (p2[0] - p1[0]) * (p[1] - p1[1]) - (p2[1] - p1[1]) * (p[0] - p1[0])
            c_in, n_in = side(cur) >= 0, side(nxt) >= 0
            if c_in:
                out.append(cur)
            if c_in != n_in:
                dc, dn = side(cur), side(nxt)
                t = dc / (dc - dn)
                out.append((cur[0] + t * (nxt[0] - cur[0]), cur[1] + t * (nxt[1] - cur[1])))
        return out

    poly = [tuple(p) for p in subject]
    cl = [tuple(p) for p in clip]
    # ensure ccw clip polygon
    a2 = sum(cl[i][0] * cl[(i + 1) % 4][1] - cl[(i + 1) % 4][0] * cl[i][1] for i in range(4))
    if a2 < 0:
        cl = cl[::-1]
    for i in range(4):
        poly = clip_edge(poly, cl[i], cl[(i + 1) % 4])
        if not poly:
            return 0.0
    n = len(poly)
    return abs(sum(poly[i][0] * poly[(i + 1) % n][1] - poly[(i + 1) % n][0] * poly[i][1] for i in range(n))) / 2


def test_iou_bev_against_numpy_clipper():
    rng = np.random.default_rng(2)
    n, m = 12, 9
    def rand_boxes(k):
        return np.stack(
            [
                rng.uniform(-5, 5, k), rng.uniform(-5, 5, k), np.zeros(k),
                rng.uniform(1, 4, k), rng.uniform(1, 4, k), np.ones(k),
                rng.uniform(-np.pi, np.pi, k),
            ],
            axis=1,
        ).astype(np.float32)

    b1, b2 = rand_boxes(n), rand_boxes(m)
    got = np.asarray(boxes_iou_bev(jnp.asarray(b1), jnp.asarray(b2)))
    c1 = np.asarray(box_corners_bev(jnp.asarray(b1)))
    c2 = np.asarray(box_corners_bev(jnp.asarray(b2)))
    for i in range(n):
        a1 = b1[i, 3] * b1[i, 4]
        for j in range(m):
            a2 = b2[j, 3] * b2[j, 4]
            inter = _np_clip_area(c1[i], c2[j])
            ref = inter / max(a1 + a2 - inter, 1e-8)
            assert abs(got[i, j] - ref) < 1e-3, (i, j, got[i, j], ref)


def test_iou3d_identity_and_disjoint():
    b = jnp.asarray([[0, 0, 0, 2, 3, 2, 0.5]], jnp.float32)
    assert abs(float(boxes_iou_3d(b, b)[0, 0]) - 1.0) < 1e-5
    b2 = jnp.asarray([[100, 100, 0, 2, 3, 2, 0.5]], jnp.float32)
    assert float(boxes_iou_3d(b, b2)[0, 0]) < 1e-6


def test_axis_aligned_iou():
    b1 = jnp.asarray([[0, 0, 2, 2]], jnp.float32)
    b2 = jnp.asarray([[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]], jnp.float32)
    got = np.asarray(axis_aligned_iou_2d(b1, b2))[0]
    np.testing.assert_allclose(got, [1 / 7, 1.0, 0.0], atol=1e-6)


def test_enlarge_boxes_keeps_gravity_center():
    b = jnp.asarray([[1, 2, -1, 2, 3, 2, 0.3]], jnp.float32)
    e = enlarge_boxes(b, (1.0, 1.0, 1.0))
    np.testing.assert_allclose(
        np.asarray(gravity_center(e)), np.asarray(gravity_center(b)), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(e[0, 3:6]), [3, 4, 3], atol=1e-6)


def test_hull_canvas_aabb_exact_vs_polygon_oracle():
    """hull_canvas_aabb (exact hull-canvas AABB, the shapely-clip
    equivalent) vs an independent oracle: scipy ConvexHull ordering +
    numpy Sutherland-Hodgman rectangle clip. Includes a diagonal hull
    crossing a canvas corner where the clamped-AABB approximation
    over-covers."""
    import numpy as np
    import jax.numpy as jnp
    from scipy.spatial import ConvexHull
    from fullysparsefusion_tpu.ops.geometry import hull_canvas_aabb

    def clip_rect(poly, W, H):
        # Sutherland-Hodgman against x>=0, x<=W, y>=0, y<=H
        def clip_half(pts, inside, intersect):
            out = []
            n = len(pts)
            for i in range(n):
                a, b = pts[i], pts[(i + 1) % n]
                ia, ib = inside(a), inside(b)
                if ia:
                    out.append(a)
                if ia != ib:
                    out.append(intersect(a, b))
            return out

        def x_cut(c):
            return lambda a, b: a + (b - a) * ((c - a[0]) / (b[0] - a[0]))

        def y_cut(c):
            return lambda a, b: a + (b - a) * ((c - a[1]) / (b[1] - a[1]))

        p = list(poly)
        for inside, inter in (
            (lambda q: q[0] >= 0, x_cut(0.0)),
            (lambda q: q[0] <= W, x_cut(W)),
            (lambda q: q[1] >= 0, y_cut(0.0)),
            (lambda q: q[1] <= H, y_cut(H)),
        ):
            if not p:
                return []
            p = clip_half(p, inside, inter)
        return p

    rng = np.random.default_rng(0)
    W, H = 100.0, 60.0
    cases = []
    for _ in range(8):
        cases.append(rng.uniform([-60, -40], [160, 100], (8, 2)))
    # thin diagonal sliver crossing near the bottom-left canvas corner:
    # clamped AABB reports a fat box, the true clipped hull is a small strip
    t = np.linspace(0, 1, 8)[:, None]
    sliver = (1 - t) * np.array([[-30.0, 40.0]]) + t * np.array([[40.0, -30.0]])
    sliver += rng.normal(0, 0.5, sliver.shape)
    cases.append(sliver)

    pts = jnp.asarray(np.stack(cases), jnp.float32)
    bb, ok = hull_canvas_aabb(pts, W, H)
    bb, ok = np.asarray(bb), np.asarray(ok)

    for gi, P in enumerate(cases):
        hull = P[ConvexHull(P).vertices]
        clipped = clip_rect(hull, W, H)
        if not clipped:
            assert not ok[gi], gi
            continue
        arr = np.stack(clipped)
        ex = [arr[:, 0].min(), arr[:, 1].min(), arr[:, 0].max(), arr[:, 1].max()]
        assert ok[gi], gi
        np.testing.assert_allclose(bb[gi], ex, atol=1e-2, err_msg=str(gi))

    # quantify the clamped-AABB over-coverage the exact clip removes
    P = cases[-1]
    cx1, cy1 = np.clip(P.min(0), [0, 0], [W, H])
    cx2, cy2 = np.clip(P.max(0), [0, 0], [W, H])
    clamped_area = (cx2 - cx1) * (cy2 - cy1)
    exact_area = (bb[-1, 2] - bb[-1, 0]) * (bb[-1, 3] - bb[-1, 1])
    assert exact_area < 0.75 * clamped_area, (exact_area, clamped_area)
