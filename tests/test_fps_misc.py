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
