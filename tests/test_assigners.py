"""Assigner oracles: 2D MaxIoU semantics, GT projection, distance assign,
hybrid merge."""
import numpy as np
import jax.numpy as jnp
import pytest

from fullysparsefusion_tpu.core.assigners import (
    max_iou_assign_2d, project_gt_boxes_2d, assign_by_dist, merge_assign,
    assign_point_in_box, hybrid_assign, flatten_gt,
)
from fullysparsefusion_tpu.utils.containers import GroundTruth


def test_max_iou_basic_pos_neg():
    preds = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110], [0, 0, 9, 10]], jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    ones = jnp.zeros(3, jnp.int32)
    got = np.asarray(
        max_iou_assign_2d(
            preds, ones, ones, jnp.ones(3, bool),
            gts, jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32),
            jnp.ones(1, bool), jnp.asarray([7], jnp.int32),
        )
    )
    assert got[0] == 7          # IoU 1.0 ≥ 0.7
    assert got[1] == -1         # no overlap
    assert got[2] == 7          # IoU 0.9 ≥ 0.7


def test_max_iou_low_quality_match():
    # pred overlaps gt at IoU 0.5 (< pos 0.7 but ≥ min_pos 0.3 and it's the
    # gt's best pred) → claimed via match_low_quality
    preds = jnp.asarray([[0, 0, 10, 5]], jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    z1 = jnp.zeros(1, jnp.int32)
    got = np.asarray(
        max_iou_assign_2d(
            preds, z1, z1, jnp.ones(1, bool),
            gts, z1, z1, jnp.ones(1, bool), jnp.asarray([3], jnp.int32),
        )
    )
    assert got[0] == 3


def test_max_iou_camera_isolation():
    # same geometry but different cameras → no match
    preds = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    z1 = jnp.zeros(1, jnp.int32)
    got = np.asarray(
        max_iou_assign_2d(
            preds, jnp.asarray([1], jnp.int32), z1, jnp.ones(1, bool),
            gts, jnp.asarray([0], jnp.int32), z1, jnp.ones(1, bool),
            jnp.asarray([0], jnp.int32),
        )
    )
    assert got[0] == -1


def test_project_gt_boxes_2d():
    # camera looking along +x (fixtures convention): box ahead projects into
    # canvas; box behind is invalid
    fx, w, h = 50.0, 200, 100
    P = jnp.asarray(
        [[w / 2, fx, 0, 0], [h / 2, 0, fx, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
        jnp.float32,
    )
    boxes = jnp.asarray(
        [[10, 0, -1, 2, 2, 2, 0.0], [-10, 0, -1, 2, 2, 2, 0.0]], jnp.float32
    )
    b2, v = project_gt_boxes_2d(boxes, jnp.stack([P, P]), w, h)
    v = np.asarray(v)
    assert v[0] and not v[1]
    b = np.asarray(b2[0])
    assert 0 <= b[0] < b[2] <= w and 0 <= b[1] < b[3] <= h
    # projected center near canvas center
    assert abs((b[0] + b[2]) / 2 - w / 2) < 15


def _gt(boxes, labels):
    boxes = np.asarray(boxes, np.float32)
    b = boxes[None]  # batch 1
    l = np.asarray(labels, np.int32)[None]
    v = np.ones_like(l, bool)
    return GroundTruth(boxes=jnp.asarray(b), labels=jnp.asarray(l), valid=jnp.asarray(v))


def test_assign_by_dist_class_gated():
    gt = _gt(
        [[0, 0, 0, 2, 2, 2, 0, 0, 0, 1], [5, 0, 0, 2, 2, 2, 0, 0, 0, 1]],
        [0, 1],
    )
    q = jnp.asarray([[0.3, 0, 0], [5.2, 0, 0], [5.2, 0, 0]], jnp.float32)
    qb = jnp.zeros(3, jnp.int32)
    qv = jnp.ones(3, bool)
    # predicted labels: 0, 1, 0 — last one predicts class 0 whose nearest
    # class-0 gt is 5.2 m away > max_dist → background
    logits = jnp.asarray([[5, 0], [0, 5], [5, 0]], jnp.float32)
    got = np.asarray(assign_by_dist(q, logits, qb, qv, gt, (1.0, 1.0)))
    assert got[0] == 0 and got[1] == 1 and got[2] == -1


def test_merge_and_point_in_box():
    gt = _gt([[0, 0, -1, 4, 4, 2, 0, 0, 0, 1]], [2])
    q = jnp.asarray([[0, 0, 0], [50, 50, 0]], jnp.float32)
    a3d = assign_point_in_box(q, jnp.zeros(2, jnp.int32), jnp.ones(2, bool), gt)
    np.testing.assert_array_equal(np.asarray(a3d), [0, -1])
    merged = merge_assign(a3d, jnp.asarray([5, 5]))
    np.testing.assert_array_equal(np.asarray(merged), [0, 5])


def test_hybrid_2d_fills_3d_background():
    # query outside the 3D box but whose 2D detection matches the projected GT
    fx, w, h = 50.0, 200, 100
    P = np.array(
        [[w / 2, fx, 0, 0], [h / 2, 0, fx, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
        np.float32,
    )
    lidar2img = jnp.asarray(np.broadcast_to(P, (1, 2, 4, 4)).copy())
    gt = _gt([[10, 0, -1, 2, 2, 2, 0, 0, 0, 1]], [0])
    b2, v2 = project_gt_boxes_2d(
        jnp.asarray([[10, 0, -1, 2, 2, 2, 0]], jnp.float32),
        jnp.asarray(np.stack([P])), w, h,
    )
    gt_box2d = np.asarray(b2[0])
    q = jnp.asarray([[30, 20, 0]], jnp.float32)  # far from the 3D box
    preds_2d = jnp.asarray(
        [[gt_box2d[0], gt_box2d[1], gt_box2d[2], gt_box2d[3], 0.9, 0, 0, 0, 1]],
        jnp.float32,
    )
    got = np.asarray(
        hybrid_assign(
            q, jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
            preds_2d, gt, gt, lidar2img, w, h,
        )
    )
    assert got[0] == 0  # 2D match fills the 3D background


def test_eval_gather_merge():
    from fullysparsefusion_tpu.parallel.eval import (
        shard_indices, write_shard_results, merge_shard_results,
    )
    import tempfile

    idx0 = shard_indices(10, process_index=0, process_count=3)
    idx1 = shard_indices(10, process_index=1, process_count=3)
    assert set(idx0) == {0, 3, 6, 9} and set(idx1) == {1, 4, 7}
    d = tempfile.mkdtemp()
    write_shard_results([{"i": 0}, {"i": 3}], d, process_index=0)
    write_shard_results([{"i": 1}, {"i": 4}], d, process_index=1)
    write_shard_results([{"i": 2}], d, process_index=2)
    merged = merge_shard_results(d)
    assert [m["i"] for m in merged] == [0, 1, 2, 3, 4]
