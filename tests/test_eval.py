"""Detection-metric sanity: perfect predictions → mAP/NDS ≈ 1; garbage → ≈ 0."""
import numpy as np

from fullysparsefusion_tpu.eval.detection import DetectionRecord, evaluate_detections


def _scene(seed, n=6):
    rng = np.random.default_rng(seed)
    boxes = np.stack(
        [
            rng.uniform(-40, 40, n), rng.uniform(-40, 40, n), rng.uniform(-2, 0, n),
            rng.uniform(1, 4, n), rng.uniform(1, 3, n), rng.uniform(1, 2, n),
            rng.uniform(-np.pi, np.pi, n), rng.normal(size=n), rng.normal(size=n),
        ],
        1,
    ).astype(np.float32)
    labels = rng.integers(0, 3, n).astype(np.int32)
    return boxes, labels


def test_perfect_predictions():
    recs = []
    for s in range(4):
        b, l = _scene(s)
        recs.append(
            DetectionRecord(
                boxes=b, scores=np.linspace(0.9, 0.5, len(b)).astype(np.float32),
                labels=l, gt_boxes=b, gt_labels=l,
            )
        )
    m = evaluate_detections(recs, 3)
    assert m["mAP"] > 0.99, m
    assert m["NDS"] > 0.99, m
    assert m["tp_errors"]["ATE"] < 1e-6


def test_garbage_predictions():
    recs = []
    for s in range(4):
        b, l = _scene(s)
        wrong = b.copy()
        wrong[:, 0] += 30  # far away
        recs.append(
            DetectionRecord(
                boxes=wrong, scores=np.full(len(b), 0.9, np.float32),
                labels=l, gt_boxes=b, gt_labels=l,
            )
        )
    m = evaluate_detections(recs, 3)
    assert m["mAP"] < 0.05, m


def test_half_detected():
    b, l = _scene(0, n=8)
    recs = [
        DetectionRecord(
            boxes=b[:4], scores=np.full(4, 0.9, np.float32), labels=l[:4],
            gt_boxes=b, gt_labels=l,
        )
    ]
    m = evaluate_detections(recs, 3)
    assert 0.1 < m["mAP"] < 0.9, m


def test_noisy_translation_raises_ate():
    rng = np.random.default_rng(1)
    b, l = _scene(2)
    noisy = b.copy()
    noisy[:, :2] += rng.normal(0, 0.4, (len(b), 2))
    recs = [
        DetectionRecord(
            boxes=noisy, scores=np.full(len(b), 0.9, np.float32), labels=l,
            gt_boxes=b, gt_labels=l,
        )
    ]
    m = evaluate_detections(recs, 3)
    assert m["tp_errors"]["ATE"] > 0.1
    assert m["mAP"] > 0.5  # still matched at coarser thresholds
