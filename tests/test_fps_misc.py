import numpy as np
import jax.numpy as jnp

from fullysparsefusion_tpu.ops.fps import furthest_point_sample, ssg_cluster
from fullysparsefusion_tpu.core.coders import ABSPointBBoxCoder


def test_fps_spreads_points():
    # two far clusters: second pick must come from the other cluster
    a = np.random.default_rng(0).normal(0, 0.1, (20, 3))
    b = np.random.default_rng(1).normal(50, 0.1, (20, 3))
    xyz = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    picks, valid = furthest_point_sample(xyz, jnp.ones(40, bool), 4)
    picks = np.asarray(picks)
    assert bool(valid.all())
    sides = picks >= 20
    assert sides[0] != sides[1]  # first two picks in different clusters


def test_fps_respects_validity():
    xyz = jnp.asarray(np.random.default_rng(2).normal(size=(30, 3)).astype(np.float32))
    valid = jnp.asarray(np.arange(30) < 10)
    picks, sel_valid = furthest_point_sample(xyz, valid, 8)
    assert np.all(np.asarray(picks)[np.asarray(sel_valid)] < 10)


def test_ssg_cluster_two_blobs():
    a = np.random.default_rng(0).normal(0, 0.2, (25, 3))
    b = np.random.default_rng(1).normal(20, 0.2, (25, 3))
    xyz = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    lab = np.asarray(
        ssg_cluster(xyz, jnp.zeros(50, jnp.int32), jnp.ones(50, bool), 4, 2.0)
    )
    assert (lab >= 0).all()
    assert len(set(lab[:25]) & set(lab[25:])) == 0  # blobs never share a center


def test_hybrid_cluster_ssg_dispatch_multi_batch():
    # the ssg dispatch must keep per-sample labels disjoint and cover
    # samples beyond the old batch≤8 unroll bound
    from fullysparsefusion_tpu.config import FSDConfig
    from fullysparsefusion_tpu.models.fsd import hybrid_cluster_one_group

    rng = np.random.default_rng(4)
    bsz, per = 10, 30
    blobs = []
    for b in range(bsz):
        blobs.append(rng.normal(0, 0.2, (per // 2, 3)))
        blobs.append(rng.normal(15, 0.2, (per // 2, 3)))
    xyz = jnp.asarray(np.concatenate(blobs).astype(np.float32))
    batch_idx = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), per)
    valid = jnp.ones((bsz * per,), bool)
    lab, ok = hybrid_cluster_one_group(
        xyz, batch_idx, valid, 0, FSDConfig(), method="ssg",
        num_fps=4, radius=2.0, batch_size=bsz,
    )
    lab, ok = np.asarray(lab), np.asarray(ok)
    assert ok.all()
    bi = np.asarray(batch_idx)
    for b in range(bsz):
        mine, others = set(lab[bi == b]), set(lab[bi != b])
        assert not mine & others  # labels disjoint across samples
        two = lab[bi == b]
        assert len(set(two[: per // 2]) & set(two[per // 2:])) == 0


def test_hybrid_cluster_ssg_invalid_rows_stay_invalid():
    from fullysparsefusion_tpu.config import FSDConfig
    from fullysparsefusion_tpu.models.fsd import hybrid_cluster_one_group

    xyz = jnp.asarray(
        np.random.default_rng(5).normal(0, 0.3, (40, 3)).astype(np.float32))
    batch_idx = jnp.zeros((40,), jnp.int32)
    valid = jnp.asarray(np.arange(40) < 25)
    lab, ok = hybrid_cluster_one_group(
        xyz, batch_idx, valid, 0, FSDConfig(), method="ssg",
        num_fps=4, radius=2.0, batch_size=1,
    )
    lab, ok = np.asarray(lab), np.asarray(ok)
    assert (lab[25:] == -1).all() and not ok[25:].any()


def test_abs_coder_roundtrip():
    rng = np.random.default_rng(3)
    boxes = np.concatenate(
        [
            rng.uniform(-40, 40, (20, 2)), rng.uniform(-3, 1, (20, 1)),
            rng.uniform(0.5, 4, (20, 3)), rng.uniform(-np.pi, np.pi, (20, 1)),
            rng.normal(size=(20, 2)),
        ],
        1,
    ).astype(np.float32)
    base = jnp.zeros((20, 3))
    coder = ABSPointBBoxCoder(code_size=10)
    dec = np.asarray(coder.decode(coder.encode(jnp.asarray(boxes), base), base))
    np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=1e-3)
