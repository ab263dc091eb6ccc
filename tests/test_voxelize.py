import numpy as np
import jax.numpy as jnp

from fullysparsefusion_tpu.ops import voxelize_points, voxel_downsample
from fullysparsefusion_tpu.ops.voxelize import grid_dims, linearize_coords, delinearize_coords


PC_RANGE = [-4.0, -4.0, -1.0, 4.0, 4.0, 1.0]
VSIZE = [0.5, 0.5, 0.5]


def test_linearize_roundtrip():
    dims = grid_dims(VSIZE, PC_RANGE)
    assert dims == (16, 16, 4)
    rng = np.random.default_rng(0)
    coords = np.stack(
        [rng.integers(0, d, size=100) for d in dims], axis=-1
    ).astype(np.int32)
    batch = rng.integers(0, 4, size=100).astype(np.int32)
    keys = linearize_coords(jnp.asarray(coords), jnp.asarray(batch), dims)
    c2, b2 = delinearize_coords(keys, dims)
    np.testing.assert_array_equal(np.asarray(c2), coords)
    np.testing.assert_array_equal(np.asarray(b2), batch)


def test_voxelize_groups_points_like_reference():
    rng = np.random.default_rng(1)
    n = 400
    xyz = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)  # some out of range
    batch = rng.integers(0, 2, size=n).astype(np.int32)
    valid = np.ones(n, bool)
    seg, coords, vb, vc = voxelize_points(
        jnp.asarray(xyz), jnp.asarray(batch), jnp.asarray(valid), VSIZE, PC_RANGE, 256
    )
    in_range = np.all((xyz >= np.array(PC_RANGE[:3])) & (xyz < np.array(PC_RANGE[3:])), axis=1)
    # reference voxel coord formula
    ref_coords = np.floor((xyz - np.array(PC_RANGE[:3])) / np.array(VSIZE)).astype(np.int64)
    sid = np.asarray(seg.seg_id)
    assert np.all(sid[~in_range] == 256)
    # points sharing (batch, voxel) share a segment; differing don't
    key = [tuple([batch[i]] + list(ref_coords[i])) for i in range(n)]
    for i in range(0, n, 17):
        if not in_range[i]:
            continue
        same = [j for j in range(n) if in_range[j] and key[j] == key[i]]
        assert len(set(sid[same])) == 1
    # voxel coords recovered for valid slots
    k = int(seg.num_segments)
    vcs = np.asarray(vc)[:k]
    assert vcs.min() >= 0 and np.all(vcs < np.array([16, 16, 4]))


def test_voxel_downsample_means():
    xyz = np.array(
        [[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [3.0, 3.0, 0.4]], dtype=np.float32
    )
    batch = np.zeros(3, np.int32)
    valid = np.ones(3, bool)
    data = {"xyz": jnp.asarray(xyz), "f": jnp.asarray([[1.0], [3.0], [10.0]])}
    out, vb, vvalid = voxel_downsample(
        data, jnp.asarray(xyz), jnp.asarray(batch), jnp.asarray(valid), VSIZE, PC_RANGE, 8
    )
    assert int(np.asarray(vvalid).sum()) == 2
    f = np.asarray(out["f"])[np.asarray(vvalid)]
    np.testing.assert_allclose(sorted(f.ravel()), [2.0, 10.0])
