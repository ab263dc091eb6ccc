"""SST backbone tests."""
import numpy as np
import jax
import jax.numpy as jnp

from fullysparsefusion_tpu.models.sst import SSTBackbone


def _voxels(seed=0, n=300, cap=512):
    rng = np.random.default_rng(seed)
    coords = np.stack(
        [rng.integers(0, 64, n), rng.integers(0, 64, n), np.zeros(n)], 1
    ).astype(np.int32)
    batch = rng.integers(0, 2, n).astype(np.int32)
    feats = rng.normal(size=(n, 32)).astype(np.float32)
    pad = cap - n
    return (
        jnp.asarray(np.concatenate([feats, np.zeros((pad, 32), np.float32)])),
        jnp.asarray(np.concatenate([coords, np.zeros((pad, 3), np.int32)])),
        jnp.asarray(np.concatenate([batch, np.zeros(pad, np.int32)])),
        jnp.asarray(np.arange(cap) < n),
        n,
    )


def test_sst_backbone_shapes_and_padding():
    feats, coords, batch, valid, n = _voxels()
    m = SSTBackbone(
        dim=64, num_blocks=2, num_heads=4,
        sparse_shape=(64, 64, 1), window_shape=(8, 8, 1),
        max_tokens=32, windows_cap=256,
    )
    vars_ = m.init(jax.random.key(0), feats, coords, batch, valid, False)
    out = m.apply(vars_, feats, coords, batch, valid, False)
    assert out.shape == (512, 64)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    np.testing.assert_array_equal(o[n:], 0.0)

    # padding invariance
    feats2 = jnp.where(valid[:, None], feats, 77.0)
    out2 = np.asarray(m.apply(vars_, feats2, coords, batch, valid, False))
    np.testing.assert_allclose(o[:n], out2[:n], atol=1e-5)


def test_sst_gradients():
    feats, coords, batch, valid, n = _voxels(1)
    m = SSTBackbone(
        dim=32, num_blocks=2, num_heads=2,
        sparse_shape=(64, 64, 1), window_shape=(8, 8, 1),
        max_tokens=32, windows_cap=256,
    )
    vars_ = m.init(jax.random.key(0), feats, coords, batch, valid, False)

    def loss(p):
        return jnp.sum(m.apply(p, feats, coords, batch, valid, False) ** 2)

    g = jax.grad(loss)(vars_)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(l).all() for l in leaves)
    assert any(np.abs(l).sum() > 0 for l in leaves)
