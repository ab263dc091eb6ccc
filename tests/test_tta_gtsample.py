"""TTA inversion + GT-paste tests."""
import numpy as np
import pytest

from fullysparsefusion_tpu.data.tta import TTAVariant, tta_grid, invert_boxes, run_tta
from fullysparsefusion_tpu.data import pipelines as P
from fullysparsefusion_tpu.data.gt_sampling import (
    build_gt_database, GTPasteSampler, NOAUG_SENTINEL,
)


def test_tta_inversion_roundtrip():
    rng = np.random.default_rng(0)
    boxes = np.concatenate(
        [
            rng.uniform(-10, 10, (5, 3)), rng.uniform(1, 4, (5, 3)),
            rng.uniform(-np.pi, np.pi, (5, 1)), rng.normal(size=(5, 2)),
        ],
        1,
    ).astype(np.float32)
    for v in tta_grid(scales=(0.95, 1.05), rotations=(0.1,), flip_horizontal=True):
        aug = P.apply_boxes_transform(boxes, v.to_params())
        back = invert_boxes(aug, v)
        np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-4)
        dy = np.angle(np.exp(1j * (back[:, 6] - boxes[:, 6])))
        np.testing.assert_allclose(dy, 0, atol=1e-5)
        np.testing.assert_allclose(back[:, 7:9], boxes[:, 7:9], atol=1e-4)


def test_run_tta_unions_variants():
    pts = np.random.default_rng(1).normal(size=(100, 5)).astype(np.float32)

    def infer(p):
        b = np.array([[0, 0, 0, 2, 2, 2, 0.0, 0, 0]], np.float32)
        return b, np.array([0.9], np.float32), np.array([0], np.int32)

    variants = tta_grid(flip_horizontal=True, flip_vertical=False)
    b, s, l = run_tta(pts, variants, infer)
    assert len(b) == 2  # one per variant


def _mini_samples():
    rng = np.random.default_rng(2)
    samples = []
    for i in range(3):
        box = np.array([5.0 + i, 0, -1, 2, 2, 2, 0.3], np.float32)
        inside = rng.uniform(-0.8, 0.8, (30, 3)).astype(np.float32) + [box[0], box[1], 0]
        pts = np.concatenate([inside, rng.random((30, 2)).astype(np.float32)], 1)
        samples.append(
            dict(points=pts, gt_boxes=box[None], gt_labels=np.array([i % 2], np.int32))
        )
    return samples


def test_gt_database_and_paste(tmp_path):
    db_path = str(tmp_path / "db.pkl")
    counts = build_gt_database(_mini_samples(), ["a", "b"], db_path, min_points=3)
    assert counts[0] >= 1 and counts[1] >= 1

    sampler = GTPasteSampler(db_path=db_path, max_per_class={0: 2, 1: 2})
    scene = dict(
        points=np.concatenate(
            [np.random.default_rng(3).normal(0, 1, (50, 5)).astype(np.float32),
             np.zeros((50, 3), np.float32)], 1
        ),  # 8-dim: with noaug channels
        gt_boxes=np.zeros((0, 9), np.float32),
        gt_labels=np.zeros(0, np.int32),
        no_aug_gt_boxes=np.zeros((0, 9), np.float32),
    )
    out = sampler(scene)
    assert len(out["gt_boxes"]) > 0
    # pasted boxes carry vel_flag 0
    assert (out["gt_boxes"][:, 9] == 0).all()
    # pasted points' no-aug channels are sentinel (never project into masks)
    n_new = len(out["points"]) - 50
    assert n_new > 0
    np.testing.assert_array_equal(out["points"][-n_new:, -3:], NOAUG_SENTINEL)
    assert len(out["no_aug_gt_boxes"]) == len(out["gt_boxes"])
