"""Debug-dump visualization (utils/visualize.py) — host-side only."""
import numpy as np
import pytest

pytest.importorskip("matplotlib")  # optional dep: only the debug dumps

from fullysparsefusion_tpu.utils.visualize import (
    bev_corners, dump_bev, dump_camera_assignment,
)


def test_bev_corners_axis_aligned():
    boxes = np.array([[1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.0]], np.float32)
    c = bev_corners(boxes)[0]
    assert c.shape == (4, 2)
    np.testing.assert_allclose(sorted(c[:, 0]), [-1, -1, 3, 3], atol=1e-5)
    np.testing.assert_allclose(sorted(c[:, 1]), [1, 1, 3, 3], atol=1e-5)


def test_bev_corners_rotation_preserves_extent():
    boxes = np.array([[0, 0, 0, 4.0, 2.0, 1.5, 0.7]], np.float32)
    c = bev_corners(boxes)[0]
    # side lengths preserved under rotation
    d01 = np.linalg.norm(c[0] - c[1])
    d12 = np.linalg.norm(c[1] - c[2])
    np.testing.assert_allclose(sorted([d01, d12]), [2.0, 4.0], atol=1e-5)


def test_dump_bev_writes_png(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
    valid = rng.random(500) > 0.1
    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.3, 0, 0, 1]], np.float32)
    pred = np.array([[0.5, 0.2, 0, 4, 2, 1.5, 0.25, 0, 0, 1],
                     [8, 8, 0, 2, 2, 2, 0, 0, 0, 1]], np.float32)
    lab = np.where(rng.random(500) < 0.2, rng.integers(0, 5, 500), -1)
    p = dump_bev(
        str(tmp_path / "scene_bev.png"), pts, point_valid=valid,
        gt_boxes=gt, pred_boxes=pred, pred_scores=np.array([0.9, 0.4]),
        cluster_labels=lab, fg_mask=rng.random(500) < 0.1,
        extent=25.0, title="test scene",
    )
    import os
    assert os.path.getsize(p) > 1000


def test_dump_camera_assignment_packed_and_raw(tmp_path):
    ids = np.zeros((60, 90), np.uint8)
    ids[10:30, 20:50] = 1
    ids[35:55, 55:80] = 2
    packed = ids.astype(np.uint16) | (np.uint16(200) << 8)
    import os

    p1 = dump_camera_assignment(
        str(tmp_path / "cam_raw.png"), ids,
        boxes2d=np.array([[18, 8, 52, 32]]), boxes2d_gt=np.array([[20, 10, 50, 30]]),
    )
    p2 = dump_camera_assignment(str(tmp_path / "cam_packed.png"), packed)
    assert os.path.getsize(p1) > 500 and os.path.getsize(p2) > 500


def test_dump_camera_assignment_channel_last_planes(tmp_path):
    # CameraData.masks samples are [H, W, cls] channel-last per-class planes
    # (the shape tools/test.py --vis-dir passes) — merged by max over classes
    planes = np.zeros((40, 60, 3), np.uint16)
    planes[5:15, 10:30, 0] = 1
    planes[20:35, 35:55, 2] = 2
    import os

    p = dump_camera_assignment(str(tmp_path / "cam_cls.png"), planes)
    assert os.path.getsize(p) > 500


def test_bev_corners_list_and_empty_inputs():
    c = bev_corners([[0, 0, 0, 4.0, 2.0, 1.5, 0.0]])
    assert c.shape == (1, 4, 2)
    assert bev_corners(np.zeros((0, 7), np.float32)).shape == (0, 4, 2)
    assert bev_corners([]).shape == (0, 4, 2)
