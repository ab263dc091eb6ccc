"""Host-side data pipeline tests (pure NumPy)."""
import numpy as np
import pytest

from fullysparsefusion_tpu.data import pipelines as P
from fullysparsefusion_tpu.data.cbgs import class_balanced_indices
from fullysparsefusion_tpu.data.av2 import yaw_to_quat_wxyz, boxes_to_av2_rows


def test_transform_points_boxes_consistent():
    rng = np.random.default_rng(0)
    tp = P.sample_transform_params(rng)
    pts = rng.normal(size=(100, 5)).astype(np.float32)
    boxes = np.array([[1, 2, -1, 2, 3, 1.5, 0.3, 0.5, -0.2]], np.float32)
    # a point at the box center must land at the transformed box center
    pts[0, :3] = boxes[0, :3]
    p2 = P.apply_points_transform(pts, tp)
    b2 = P.apply_boxes_transform(boxes, tp)
    np.testing.assert_allclose(p2[0, :3], b2[0, :3], atol=1e-5)
    # dims scale
    np.testing.assert_allclose(b2[0, 3:6], boxes[0, 3:6] * tp.scale, atol=1e-6)
    # non-xyz channels untouched
    np.testing.assert_array_equal(p2[:, 3:], pts[:, 3:])


def test_flip_yaw_and_velocity():
    tp = P.TransformParams(flip_x=True)
    boxes = np.array([[1, 2, -1, 2, 3, 1.5, 0.3, 0.5, -0.2]], np.float32)
    b2 = P.apply_boxes_transform(boxes, tp)
    assert b2[0, 1] == -2 and b2[0, 6] == pytest.approx(-0.3)
    assert b2[0, 8] == pytest.approx(0.2)


def test_save_noaug_then_transform_preserves_raw():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(50, 5)).astype(np.float32)
    saved = P.save_noaug_channels(pts)
    tp = P.sample_transform_params(rng)
    live = P.apply_points_transform(saved[:, :-3], tp)
    out = np.concatenate([live, saved[:, -3:]], 1)
    np.testing.assert_array_equal(out[:, -3:], pts[:, :3])
    assert not np.allclose(out[:, :3], pts[:, :3])


def test_range_filter_alignment():
    boxes = np.array([[0, 0, 0, 1, 1, 1, 0], [99, 99, 0, 1, 1, 1, 0]], np.float32)
    labels = np.array([1, 2], np.int32)
    noaug = boxes + 5
    b, l, (na,) = P.filter_boxes_range(boxes, labels, (-50, -50, 50, 50), [noaug])
    assert len(b) == 1 and l[0] == 1
    np.testing.assert_array_equal(na, noaug[:1])


def test_collate_fixed_shapes():
    s1 = dict(
        points=np.ones((30, 8), np.float32),
        gt_boxes=np.ones((2, 9), np.float32),
        gt_labels=np.array([0, 1], np.int32),
        no_aug_gt_boxes=np.ones((2, 9), np.float32),
    )
    s2 = dict(
        points=np.ones((45, 8), np.float32) * 2,
        gt_boxes=np.ones((1, 9), np.float32),
        gt_labels=np.array([3], np.int32),
        no_aug_gt_boxes=np.ones((1, 9), np.float32),
    )
    out = P.collate_scene([s1, s2], n_points_cap=100, max_gt=4)
    assert out["points"].shape == (100, 8)
    assert out["valid"].sum() == 75
    assert (out["batch_idx"][:30] == 0).all() and (out["batch_idx"][30:75] == 1).all()
    assert out["gt_boxes"].shape == (2, 4, 10)
    assert out["gt_boxes"][0, 0, 9] == 1.0  # vel-valid flag padded to 1
    assert out["gt_valid"].sum() == 3
    assert out["gt_labels"][1, 0] == 3


def test_cbgs_balances_rare_classes():
    rng = np.random.default_rng(0)
    # class 0 in 90 samples, class 1 in 10
    sample_classes = [[0]] * 90 + [[1]] * 10
    idx = class_balanced_indices(sample_classes, 2, rng)
    c1 = sum(1 for i in idx if i >= 90)
    c0 = len(idx) - c1
    assert c1 / max(c0, 1) > 0.5, (c0, c1)  # rare class heavily upsampled


def test_av2_feather_rows():
    boxes = np.array([[1, 2, -1, 4, 2, 1.5, np.pi / 2]], np.float32)
    rows = boxes_to_av2_rows(boxes, np.array([0.9]), np.array([0]), ["Regular_vehicle"], "log1", 123)
    r = rows[0]
    assert r["tz_m"] == pytest.approx(-0.25)
    assert r["category"] == "REGULAR_VEHICLE"
    q = yaw_to_quat_wxyz(np.array([np.pi / 2]))[0]
    assert q[0] == pytest.approx(np.cos(np.pi / 4))
    assert q[3] == pytest.approx(np.sin(np.pi / 4))


def test_waymo_mask_variant(tmp_path):
    """load_sample_masks_waymo: named per-class PNGs, nested anno layout,
    back-camera resize with lidar2img/bbox rescaling (loading.py:141-167)."""
    import json
    import numpy as np
    from PIL import Image
    from fullysparsefusion_tpu.data.masks import load_sample_masks_waymo

    sdir = tmp_path / "seg0"
    sdir.mkdir()
    H, W = 64, 96
    # cam 0 native-res vehicle mask with instance id 1
    m0 = np.zeros((H, W), np.uint8)
    m0[10:20, 30:50] = 1
    Image.fromarray(m0).save(sdir / "0_vehicle.png")
    # cam 3 (back) at HALF resolution — must be resized up
    m3 = np.zeros((H // 2, W // 2), np.uint8)
    m3[5:10, 15:25] = 2
    Image.fromarray(m3).save(sdir / "3_pedestrian.png")
    anno = {
        "0": {"vehicle": [{"bbox": [30, 10, 50, 20], "score": 0.9, "obj_id": 0}]},
        "3": {"pedestrian": [{"bbox": [15, 5, 25, 10], "score": 0.8, "obj_id": 1}]},
    }
    (sdir / "anno.json").write_text(json.dumps(anno))

    l2i = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    masks, annos, l2i_out = load_sample_masks_waymo(
        str(tmp_path), "seg0", l2i, img_hw=(H, W),
        class_names=("vehicle", "pedestrian", "cyclist"),
    )
    assert masks.shape == (5, H, W, 3) and masks.dtype == np.uint8
    assert (masks[0, :, :, 0] == 1).sum() == 10 * 20
    # back cam upsampled ×2 in each dim → 4× the pixels
    assert (masks[3, :, :, 1] == 2).sum() == 4 * (5 * 10)
    # lidar2img rows scaled for the resized camera only
    assert l2i_out[3, 0, 0] == 2.0 and l2i_out[3, 1, 1] == 2.0
    assert l2i_out[0, 0, 0] == 1.0
    # anno bbox of cam 3 rescaled into the common grid
    row = annos[annos[:, 6] == 3][0]
    np.testing.assert_allclose(row[:4], [30, 10, 50, 20], atol=1e-5)
    # categories from class names
    assert annos[0, 5] == 0 and row[5] == 1


def test_lidar2img_from_cams_matches_projection():
    """Deriving lidar2img from an mmdet3d-style ``cams`` dict (real pickles
    store per-cam calib, not precomputed matrices) — verify a known point
    projects through K·[R|t]⁻¹ and that camera rows follow the mmdet3d
    camera_types order."""
    from fullysparsefusion_tpu.data.nuscenes import (
        NUSC_CAMERA_ORDER, lidar2img_from_cams,
    )

    rng = np.random.default_rng(0)
    # random valid rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.normal(size=3)
    fx, fy, cx, cy = 800.0, 810.0, 640.0, 360.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    cam = dict(sensor2lidar_rotation=q, sensor2lidar_translation=t,
               cam_intrinsic=K)
    cams = {name: cam for name in NUSC_CAMERA_ORDER}
    mats = lidar2img_from_cams(cams)
    assert mats.shape == (6, 4, 4)

    p_lidar = np.array([3.0, -1.0, 0.5])
    # ground truth: cam coords = R⁻¹(p − t), pixel = K @ cam, divide by z
    p_cam = np.linalg.inv(q) @ (p_lidar - t)
    expect_uv = (K @ p_cam)[:2] / p_cam[2]
    got = mats[0] @ np.append(p_lidar, 1.0)
    got_uv = got[:2] / got[2]
    np.testing.assert_allclose(got_uv, expect_uv, rtol=1e-4)
    np.testing.assert_allclose(got[2], p_cam[2], rtol=1e-5)

    # partial camera sets fall back to dict order
    two = {"CAM_WEIRD": cam, "CAM_FRONT": cam}
    assert lidar2img_from_cams(two).shape == (2, 4, 4)
