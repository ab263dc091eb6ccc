"""Oracle tests for segment ops against NumPy (SURVEY.md §4: every kernel gets
a dense/NumPy oracle)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fullysparsefusion_tpu.ops import (
    INVALID_KEY,
    unique_segments,
    segment_sum,
    segment_mean,
    segment_max,
    ingroup_indices,
)


def _np_unique_ref(keys, valid):
    """torch.unique(return_inverse=True, return_counts=True) semantics."""
    vk = keys[valid]
    uniq, inv, counts = np.unique(vk, return_inverse=True, return_counts=True)
    return uniq, inv, counts


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_unique_segments_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    n, cap = 257, 64
    keys = rng.integers(0, 40, size=n).astype(np.int32)
    valid = rng.random(n) > 0.2
    seg = unique_segments(jnp.asarray(keys), jnp.asarray(valid), cap)

    uniq, inv, counts = _np_unique_ref(keys, valid)
    k = len(uniq)
    assert int(seg.num_segments) == k
    np.testing.assert_array_equal(np.asarray(seg.unique_keys[:k]), uniq)
    assert np.all(np.asarray(seg.unique_keys[k:]) == INVALID_KEY)
    np.testing.assert_array_equal(np.asarray(seg.counts[:k]), counts)
    # per-point inverse mapping matches (valid points only)
    got_inv = np.asarray(seg.seg_id)[valid]
    np.testing.assert_array_equal(got_inv, inv)
    # invalid points land in the trash segment
    assert np.all(np.asarray(seg.seg_id)[~valid] == cap)


def test_unique_segments_overflow_goes_to_trash():
    keys = jnp.arange(100, dtype=jnp.int32)
    valid = jnp.ones(100, bool)
    seg = unique_segments(keys, valid, 32)
    assert int(seg.num_segments) == 100
    sid = np.asarray(seg.seg_id)
    assert np.all(sid[:32] == np.arange(32))
    assert np.all(sid[32:] == 32)  # overflow dropped to trash


@pytest.mark.parametrize("mode", ["sum", "mean", "max"])
def test_segment_reduce_oracle(mode):
    rng = np.random.default_rng(3)
    n, cap, c = 500, 48, 7
    keys = rng.integers(0, 30, size=n).astype(np.int32)
    valid = rng.random(n) > 0.1
    feat = rng.normal(size=(n, c)).astype(np.float32)
    seg = unique_segments(jnp.asarray(keys), jnp.asarray(valid), cap)

    if mode == "sum":
        got = segment_sum(jnp.asarray(feat), seg.seg_id, cap)
    elif mode == "mean":
        got = segment_mean(jnp.asarray(feat), seg.seg_id, cap, counts=seg.counts)
    else:
        got = segment_max(jnp.asarray(feat), seg.seg_id, cap)
    got = np.asarray(got)

    uniq = np.unique(keys[valid])
    for i, u in enumerate(uniq):
        rows = feat[valid & (keys == u)]
        ref = {"sum": rows.sum(0), "mean": rows.mean(0), "max": rows.max(0)}[mode]
        np.testing.assert_allclose(got[i], ref, rtol=1e-5, atol=1e-5)
    # unused capacity rows are zero-filled
    np.testing.assert_array_equal(got[len(uniq):], 0.0)


def test_ingroup_indices_oracle():
    rng = np.random.default_rng(4)
    n = 300
    gids = rng.integers(0, 25, size=n).astype(np.int32)
    valid = rng.random(n) > 0.15
    got = np.asarray(ingroup_indices(jnp.asarray(gids), jnp.asarray(valid)))

    # reference semantics (ops/sst_ops.py:190-237): within each group, indices
    # are a permutation of 0..k-1; stable sort means first-occurrence order.
    assert np.all(got[~valid] == -1)
    for g in np.unique(gids[valid]):
        vals = got[valid & (gids == g)]
        np.testing.assert_array_equal(np.sort(vals), np.arange(len(vals)))
        # stable: occurrence order preserved
        np.testing.assert_array_equal(vals, np.arange(len(vals)))


def test_sorted_unsorted_segment_sum_matches_scatter():
    from fullysparsefusion_tpu.ops.segment import (
        sorted_unsorted_segment_sum, gather_rows,
    )
    rng = np.random.default_rng(0)
    n, rows_n, c = 500, 37, 8
    rows = jnp.asarray(rng.integers(0, rows_n + 3, (n,)), jnp.int32)  # some OOR
    vals = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    out = sorted_unsorted_segment_sum(vals, rows, rows_n)
    ref = jax.ops.segment_sum(vals, rows, num_segments=rows_n + 3)[:rows_n]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gather_rows_vjp_matches_autodiff():
    from fullysparsefusion_tpu.ops.segment import gather_rows
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(50, 6)), jnp.float32)
    rows = jnp.asarray(rng.integers(0, 50, (200,)), jnp.int32)
    cot = jnp.asarray(rng.normal(size=(200, 6)), jnp.float32)

    def f_custom(t):
        return jnp.sum(gather_rows(t, rows) * cot)

    def f_plain(t):
        return jnp.sum(t[rows] * cot)

    np.testing.assert_allclose(float(f_custom(table)), float(f_plain(table)),
                               rtol=1e-6)
    g1 = jax.grad(f_custom)(table)
    g2 = jax.grad(f_plain)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_unique_segments_dense_matches_sorted(seed):
    """Sort-free dense path == sorted path field-for-field (incl. overflow
    + invalid handling)."""
    from fullysparsefusion_tpu.ops.segment import unique_segments_dense

    rng = np.random.default_rng(seed)
    n, cap, cells = 513, 48, 600
    keys = rng.integers(0, cells, size=n).astype(np.int32)
    valid = rng.random(n) > 0.25
    a = unique_segments(jnp.asarray(keys), jnp.asarray(valid), cap)
    b = unique_segments_dense(jnp.asarray(keys), jnp.asarray(valid), cells, cap)
    for f in ("seg_id", "unique_keys", "counts", "num_segments", "seg_valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f)


@pytest.mark.parametrize("n", [5, 512, 4097, 300_001, 2_100_001])
def test_cumsum_marks_exact(n):
    from fullysparsefusion_tpu.ops.segment import cumsum_marks

    rng = np.random.default_rng(n)
    marks = (rng.random(n) < 0.37).astype(np.int8)
    got = np.asarray(jax.jit(cumsum_marks)(jnp.asarray(marks)))
    np.testing.assert_array_equal(got, np.cumsum(marks.astype(np.int64)))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_unique_keys_sorted_matches_unique_segments(seed):
    """The keys-only fast path (no seg_id/counts) must agree with the full
    unique_segments on keys, validity, and count — incl. overflow-drop."""
    from fullysparsefusion_tpu.ops.segment import unique_keys_sorted

    rng = np.random.default_rng(seed)
    n = 4099 + seed  # > _CUMSUM_BASE so the MXU prefix-sum level runs
    cap = 48
    keys = rng.integers(0, 70, size=n).astype(np.int32)
    valid = rng.random(n) > 0.3
    uniq, seg_valid, num = jax.jit(
        unique_keys_sorted, static_argnums=2)(
        jnp.asarray(keys), jnp.asarray(valid), cap)
    ref = unique_segments(jnp.asarray(keys), jnp.asarray(valid), cap)
    np.testing.assert_array_equal(np.asarray(uniq), np.asarray(ref.unique_keys))
    np.testing.assert_array_equal(np.asarray(seg_valid), np.asarray(ref.seg_valid))
    assert int(num) == int(ref.num_segments)
    # no valid keys at all
    uniq0, sv0, num0 = unique_keys_sorted(
        jnp.asarray(keys), jnp.zeros(n, bool), cap)
    assert int(num0) == 0 and not bool(np.any(np.asarray(sv0)))
