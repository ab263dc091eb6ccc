"""CCL oracle = pure-python union-find; NMS oracle = greedy numpy loop."""
import numpy as np
import jax.numpy as jnp
import pytest

from fullysparsefusion_tpu.ops.ccl import connected_components_bev
from fullysparsefusion_tpu.ops.nms import nms_bev_mask, multiclass_nms_bev
from fullysparsefusion_tpu.core.coders import BasePointBBoxCoder


def _uf_components(xy, batch, valid, dist):
    n = len(xy)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(i + 1, n):
            if not (valid[i] and valid[j]) or batch[i] != batch[j]:
                continue
            if np.hypot(*(xy[i, :2] - xy[j, :2])) < dist:
                parent[find(i)] = find(j)
    roots, labels, seen = {}, np.full(n, -1), 0
    for i in range(n):
        if not valid[i]:
            continue
        r = find(i)
        if r not in roots:
            roots[r] = seen
            seen += 1
        labels[i] = roots[r]
    return labels


@pytest.mark.parametrize("seed", [0, 1, 5])
def test_ccl_matches_union_find(seed):
    rng = np.random.default_rng(seed)
    n = 120
    xy = rng.uniform(0, 20, size=(n, 2)).astype(np.float32)
    batch = rng.integers(0, 3, size=n).astype(np.int32)
    valid = rng.random(n) > 0.1
    got = np.asarray(
        connected_components_bev(jnp.asarray(xy), jnp.asarray(batch), jnp.asarray(valid), 1.5)
    )
    ref = _uf_components(xy, batch, valid, 1.5)
    np.testing.assert_array_equal(got, ref)


def test_ccl_chain():
    # a long chain must fully merge (tests pointer-jumping convergence)
    n = 64
    xy = np.stack([np.arange(n) * 0.9, np.zeros(n)], 1).astype(np.float32)
    got = np.asarray(
        connected_components_bev(
            jnp.asarray(xy), jnp.zeros(n, jnp.int32), jnp.ones(n, bool), 1.0
        )
    )
    assert np.all(got == 0)


def _np_nms(boxes, scores, valid, thr, iou_fn):
    order = np.argsort(-np.where(valid, scores, -np.inf), kind="stable")
    keep, suppressed = [], np.zeros(len(boxes), bool)
    for i in order:
        if not valid[i] or suppressed[i]:
            continue
        keep.append(i)
        ious = iou_fn(boxes[i : i + 1], boxes)[0]
        suppressed |= ious > thr
        suppressed[i] = False
    mask = np.zeros(len(boxes), bool)
    mask[keep] = True
    return mask


def test_nms_oracle():
    from fullysparsefusion_tpu.ops.geometry import boxes_iou_bev

    rng = np.random.default_rng(3)
    n = 40
    boxes = np.stack(
        [
            rng.uniform(-10, 10, n), rng.uniform(-10, 10, n), np.zeros(n),
            rng.uniform(1, 4, n), rng.uniform(1, 4, n), np.ones(n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        1,
    ).astype(np.float32)
    scores = rng.random(n).astype(np.float32)
    valid = rng.random(n) > 0.1
    got = np.asarray(nms_bev_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.2))
    iou_fn = lambda a, b: np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    ref = _np_nms(boxes, scores, valid, 0.2, iou_fn)
    np.testing.assert_array_equal(got, ref)


def test_multiclass_nms_shapes_and_classes():
    boxes = jnp.asarray(
        [
            [0, 0, 0, 2, 2, 2, 0.0],
            [0.1, 0, 0, 2, 2, 2, 0.0],   # overlaps box 0
            [50, 50, 0, 2, 2, 2, 0.0],
        ],
        jnp.float32,
    )
    # per-class score channels: box0 strong cls0; box1 strong cls0 (suppressed)
    # but strong cls1 (kept); box2 below threshold everywhere
    scores = jnp.asarray([[0.9, 0.0], [0.8, 0.7], [0.01, 0.02]])
    out = multiclass_nms_bev(
        boxes, scores, jnp.ones(3, bool), iou_thr=0.3, score_thr=0.05, max_num=4,
    )
    v = np.asarray(out.valid)
    assert v.sum() == 2
    kept = sorted(np.asarray(out.scores)[v].tolist(), reverse=True)
    np.testing.assert_allclose(kept, [0.9, 0.7], atol=1e-6)
    assert set(np.asarray(out.labels)[v].tolist()) == {0, 1}


def test_bbox_coder_roundtrip():
    rng = np.random.default_rng(0)
    n = 50
    boxes = np.stack(
        [
            rng.uniform(-10, 10, n), rng.uniform(-10, 10, n), rng.uniform(-3, 1, n),
            rng.uniform(0.5, 5, n), rng.uniform(0.5, 5, n), rng.uniform(0.5, 3, n),
            rng.uniform(-np.pi, np.pi, n),
            rng.normal(size=n), rng.normal(size=n),
        ],
        1,
    ).astype(np.float32)
    base = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    coder = BasePointBBoxCoder(code_size=10)
    enc = coder.encode(jnp.asarray(boxes), jnp.asarray(base))
    dec = np.asarray(coder.decode(enc, jnp.asarray(base)))
    np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=1e-4)
    # yaw reconstructed mod 2π
    dy = np.angle(np.exp(1j * (dec[:, 6] - boxes[:, 6])))
    np.testing.assert_allclose(dy, 0, atol=1e-4)
    np.testing.assert_allclose(dec[:, 7:9], boxes[:, 7:9], atol=1e-5)


def test_batched_multiclass_nms_matches_per_sample_loop():
    """One global suppression pass with cross-sample IoU zeroed must equal
    the per-sample loop exactly (boxes of different samples are disjoint)."""
    from fullysparsefusion_tpu.ops.nms import multiclass_nms_bev_batched

    rng = np.random.default_rng(7)
    n, n_cls, bsz = 96, 4, 3
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, :2] = rng.uniform(-20, 20, (n, 2))
    boxes[:, 2] = rng.uniform(-2, 1, n)
    boxes[:, 3:6] = rng.uniform(1.5, 6, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.random((n, n_cls)).astype(np.float32)
    valid = rng.random(n) > 0.15
    batch_idx = rng.integers(0, bsz, n).astype(np.int32)

    boxes_j, scores_j = jnp.asarray(boxes), jnp.asarray(scores)
    valid_j, bidx_j = jnp.asarray(valid), jnp.asarray(batch_idx)

    got = multiclass_nms_bev_batched(
        boxes_j, scores_j, valid_j, bidx_j, bsz,
        iou_thr=0.25, score_thr=0.1, max_num=32,
    )
    for bi in range(bsz):
        ref = multiclass_nms_bev(
            boxes_j, scores_j, valid_j & (bidx_j == bi),
            iou_thr=0.25, score_thr=0.1, max_num=32,
        )
        np.testing.assert_array_equal(np.asarray(got.valid[bi]), np.asarray(ref.valid))
        np.testing.assert_allclose(
            np.asarray(got.scores[bi]), np.asarray(ref.scores), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(got.labels[bi]), np.asarray(ref.labels))
        np.testing.assert_allclose(
            np.asarray(got.boxes[bi]), np.asarray(ref.boxes), atol=1e-6)


def test_batched_ccl_pallas_wiring_matches_while_loop(monkeypatch):
    """The Pallas-wired batched CCL path (adjacency build + fixed sweeps +
    relabel) must reproduce the XLA while_loop path exactly, including
    batch separation and invalid nodes."""
    import jax.numpy as jnp
    import fullysparsefusion_tpu.ops.ccl as ccl
    import fullysparsefusion_tpu.ops.pallas_kernels as pk

    rng = np.random.default_rng(7)
    g, n = 3, 64
    xy = rng.uniform(0, 10, (g, n, 2)).astype(np.float32)
    batch = rng.integers(0, 2, (g, n)).astype(np.int32)
    valid = rng.random((g, n)) > 0.15

    ref = np.asarray(ccl.connected_components_bev_batched(
        jnp.asarray(xy), jnp.asarray(batch), jnp.asarray(valid)))

    orig = pk.ccl_sweeps_pallas
    monkeypatch.setattr(
        pk, "ccl_sweeps_pallas",
        lambda adj, v, sweeps: orig(adj, v, sweeps=sweeps, interpret=True))
    monkeypatch.setattr(ccl, "_pallas_ccl_ok", lambda n_: True)
    got = np.asarray(ccl.connected_components_bev_batched(
        jnp.asarray(xy), jnp.asarray(batch), jnp.asarray(valid)))
    np.testing.assert_array_equal(got, ref)
