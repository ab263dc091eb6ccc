"""SST window partition oracles."""
import numpy as np
import jax.numpy as jnp

from fullysparsefusion_tpu.ops.window import (
    window_partition, flat_to_window, window_to_flat, window_position_embedding,
)


def _setup(seed=0, n=200, shift=False):
    rng = np.random.default_rng(seed)
    coords = np.stack(
        [rng.integers(0, 16, n), rng.integers(0, 16, n), rng.integers(0, 4, n)], 1
    ).astype(np.int32)
    batch = rng.integers(0, 2, n).astype(np.int32)
    valid = rng.random(n) > 0.1
    part = window_partition(
        jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid),
        (16, 16, 4), (4, 4, 4), shift, windows_cap=64,
    )
    return coords, batch, valid, part


def test_window_assignment_consistent():
    coords, batch, valid, part = _setup()
    sid = np.asarray(part.seg.seg_id)
    win = coords // 4
    for i in range(len(coords)):
        for j in range(i + 1, len(coords)):
            if not (valid[i] and valid[j]):
                continue
            same = (batch[i] == batch[j]) and np.array_equal(win[i], win[j])
            assert (sid[i] == sid[j]) == same, (i, j)


def test_shifted_windows_differ():
    coords, batch, valid, p0 = _setup(shift=False)
    _, _, _, p1 = _setup(shift=True)
    # voxel at coord 2 (inside win 0 unshifted) moves window when shifted
    assert not np.array_equal(np.asarray(p0.win_coords), np.asarray(p1.win_coords))


def test_flat_window_roundtrip():
    coords, batch, valid, part = _setup(1)
    n = len(coords)
    feats = jnp.asarray(np.random.default_rng(2).normal(size=(n, 8)).astype(np.float32))
    win, mask = flat_to_window(feats, part, jnp.asarray(valid), max_tokens=32)
    back = window_to_flat(win, part, jnp.asarray(valid), max_tokens=32)
    kept = valid & (np.asarray(part.inner_idx) < 32) & (np.asarray(part.inner_idx) >= 0)
    np.testing.assert_allclose(np.asarray(back)[kept], np.asarray(feats)[kept], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(back)[~kept], 0)
    # mask count equals kept voxels
    assert int(mask.sum()) == int(kept.sum())


def test_token_drop_at_max_tokens():
    # all voxels in one window; max_tokens drops the tail
    n = 50
    coords = jnp.zeros((n, 3), jnp.int32)
    batch = jnp.zeros(n, jnp.int32)
    valid = jnp.ones(n, bool)
    part = window_partition(coords, batch, valid, (16, 16, 4), (4, 4, 4), False, 8)
    feats = jnp.ones((n, 4))
    win, mask = flat_to_window(feats, part, valid, max_tokens=16)
    assert int(mask.sum()) == 16  # 34 tokens dropped


def test_position_embedding_shape():
    coords, batch, valid, part = _setup(3)
    pe = window_position_embedding(jnp.asarray(coords), part, (4, 4, 4), 32)
    assert pe.shape == (len(coords), 32)
    assert bool(jnp.isfinite(pe).all())
