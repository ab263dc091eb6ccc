"""Sparse conv vs dense NumPy-loop conv oracle on tiny grids (SURVEY.md §4:
sparse conv validated against dense conv)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fullysparsefusion_tpu.ops.sparse_conv import (
    SparseTensor,
    subm_conv3d,
    sparse_conv3d,
    sparse_inverse_conv3d,
    downsample_coords,
    build_subm_rulebook,
    conv_out_dim,
)

DIMS = (6, 6, 5)


def _dense_conv(dense, w, b, k, s, p):
    """out[y] = sum_k in[y*s - p + k] @ w[k]; dense [nx,ny,nz,Cin]."""
    nx, ny, nz, cin = dense.shape
    cout = w.shape[-1]
    od = tuple(conv_out_dim(n, kk, ss, pp) for n, kk, ss, pp in zip((nx, ny, nz), k, s, p))
    out = np.zeros(od + (cout,), np.float32)
    for ox in range(od[0]):
        for oy in range(od[1]):
            for oz in range(od[2]):
                acc = np.zeros(cout, np.float32)
                ki = 0
                for kz in range(k[2]):
                    for ky in range(k[1]):
                        for kx in range(k[0]):
                            ix = ox * s[0] - p[0] + kx
                            iy = oy * s[1] - p[1] + ky
                            iz = oz * s[2] - p[2] + kz
                            if 0 <= ix < nx and 0 <= iy < ny and 0 <= iz < nz:
                                acc += dense[ix, iy, iz] @ w[kz * k[1] * k[0] + ky * k[0] + kx]
                            ki += 1
                out[ox, oy, oz] = acc + (b if b is not None else 0)
    return out


def _make_sparse(seed, cin=4, n_active=25, cap=64, batch_size=2):
    rng = np.random.default_rng(seed)
    # unique coords per batch element
    all_coords, all_batch = [], []
    for bi in range(batch_size):
        lin = rng.choice(DIMS[0] * DIMS[1] * DIMS[2], size=n_active, replace=False)
        c = np.stack([lin % DIMS[0], (lin // DIMS[0]) % DIMS[1], lin // (DIMS[0] * DIMS[1])], 1)
        all_coords.append(c)
        all_batch.append(np.full(n_active, bi))
    coords = np.concatenate(all_coords).astype(np.int32)
    batch = np.concatenate(all_batch).astype(np.int32)
    n = len(coords)
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    pad = cap - n
    st = SparseTensor(
        feats=jnp.asarray(np.concatenate([feats, np.zeros((pad, cin), np.float32)])),
        coords=jnp.asarray(np.concatenate([coords, np.zeros((pad, 3), np.int32)])),
        batch=jnp.asarray(np.concatenate([batch, np.zeros(pad, np.int32)])),
        valid=jnp.asarray(np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])),
        dims=DIMS,
    )
    denses = []
    for bi in range(batch_size):
        d = np.zeros(DIMS + (cin,), np.float32)
        m = batch == bi
        d[coords[m, 0], coords[m, 1], coords[m, 2]] = feats[m]
        denses.append(d)
    return st, denses, coords, batch, n


@pytest.mark.parametrize("seed", [0, 1])
def test_subm_conv_matches_dense(seed):
    rng = np.random.default_rng(seed + 10)
    cin, cout = 4, 6
    st, denses, coords, batch, n = _make_sparse(seed, cin)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
    b = rng.normal(size=cout).astype(np.float32)
    got = np.asarray(subm_conv3d(st, jnp.asarray(w), jnp.asarray(b)))
    for bi, dense in enumerate(denses):
        ref = _dense_conv(dense, w, b, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        m = batch == bi
        ref_vals = ref[coords[m, 0], coords[m, 1], coords[m, 2]]
        np.testing.assert_allclose(got[:n][m], ref_vals, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(got[n:], 0.0)


@pytest.mark.parametrize("seed", [0, 1])
def test_identity_tap_matches_gather(seed):
    """identity_tap=13 (center tap as a direct masked matmul) must equal the
    all-gather form exactly at f32 — forward and both gradients."""
    import jax
    from fullysparsefusion_tpu.ops.sparse_conv import (
        build_subm_rulebook,
        center_tap,
        subm_conv_apply,
    )

    assert center_tap((3, 3, 3)) == 13
    assert center_tap((3, 3, 2)) is None

    rng = np.random.default_rng(seed + 40)
    cin, cout = 4, 6
    st, _, _, _, n = _make_sparse(seed, cin)
    # poison the padding rows: identity handling must not leak them
    feats = st.feats.at[n:].set(7.7)
    st = st.replace(feats=feats)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)
    rb = build_subm_rulebook(st)

    def run(f, w_, **kw):
        return subm_conv_apply(
            f, st.valid, rb, w_, compute_dtype=jnp.float32, **kw)

    ref = np.asarray(run(st.feats, w))
    cases = {
        "full+idt": dict(identity_tap=13),
    }
    for name, kw in cases.items():
        np.testing.assert_allclose(
            np.asarray(run(st.feats, w, **kw)), ref, rtol=1e-5, atol=1e-5,
            err_msg=name)
        for argnum in (0, 1):
            g_ref = jax.grad(lambda f, w_: jnp.sum(run(f, w_) ** 2),
                             argnums=argnum)(st.feats, w)
            g_idt = jax.grad(lambda f, w_: jnp.sum(run(f, w_, **kw) ** 2),
                             argnums=argnum)(st.feats, w)
            np.testing.assert_allclose(
                np.asarray(g_idt), np.asarray(g_ref), rtol=1e-4, atol=1e-4,
                err_msg=f"{name} grad arg{argnum}")

    # the center tap always hits every valid row
    n_center = int(np.asarray(rb.hits[13]).sum())
    assert n_center == int(np.asarray(st.valid).sum())


@pytest.mark.parametrize("padding", [(1, 1, 1), (0, 1, 1)])
def test_strided_conv_matches_dense(padding):
    rng = np.random.default_rng(42)
    cin, cout = 4, 5
    st, denses, coords, batch, n = _make_sparse(3, cin)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
    b = rng.normal(size=cout).astype(np.float32)
    out = sparse_conv3d(
        st, jnp.asarray(w), jnp.asarray(b), (3, 3, 3), (2, 2, 2), padding, out_capacity=128
    )
    oc = np.asarray(out.coords)
    ob = np.asarray(out.batch)
    ov = np.asarray(out.valid)
    of = np.asarray(out.feats)
    refs = [_dense_conv(d, w, b, (3, 3, 3), (2, 2, 2), padding) for d in denses]
    assert out.dims == refs[0].shape[:3]
    # every active output matches dense; actives cover every nonzero dense site
    for i in range(len(ov)):
        if not ov[i]:
            np.testing.assert_array_equal(of[i], 0.0)
            continue
        ref = refs[ob[i]][oc[i, 0], oc[i, 1], oc[i, 2]]
        np.testing.assert_allclose(of[i], ref, rtol=1e-4, atol=1e-4)
    for bi, ref in enumerate(refs):
        nz = np.argwhere(np.abs(ref - b).sum(-1) > 1e-5)
        active = {tuple(c) for c, bb, v in zip(oc, ob, ov) if v and bb == bi}
        for site in nz:
            assert tuple(site) in active, f"dense-active site {site} missing from sparse set"


def test_inverse_conv_matches_dense_transpose():
    rng = np.random.default_rng(7)
    cin, cout = 3, 4
    st, denses, coords, batch, n = _make_sparse(5, cin)
    k, s, p = (3, 3, 3), (2, 2, 2), (1, 1, 1)
    # downsample to get a coarse set, random coarse feats
    w_down = rng.normal(size=(27, cin, cin)).astype(np.float32) * 0.1
    coarse = sparse_conv3d(st, jnp.asarray(w_down), None, k, s, p, out_capacity=96)
    # inverse conv back onto the fine set
    w_up = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
    up = sparse_inverse_conv3d(
        coarse, st.coords, st.batch, st.valid, st.dims, jnp.asarray(w_up), None, k, s, p
    )
    # dense oracle: out[t] = sum_k coarse[(t+p-k)/s] @ w[k] (exact div)
    cf = np.asarray(coarse.feats)
    cc = np.asarray(coarse.coords)
    cb = np.asarray(coarse.batch)
    cv = np.asarray(coarse.valid)
    dense_c = {}
    for bi in range(2):
        d = np.zeros(coarse.dims + (cin,), np.float32)
        m = cv & (cb == bi)
        d[cc[m, 0], cc[m, 1], cc[m, 2]] = cf[m]
        dense_c[bi] = d
    got = np.asarray(up.feats)
    for i in range(n):
        t = coords[i]
        acc = np.zeros(cout, np.float32)
        for kz in range(3):
            for ky in range(3):
                for kx in range(3):
                    num = t + np.array(p) - np.array([kx, ky, kz])
                    if np.all(num % np.array(s) == 0):
                        y = num // np.array(s)
                        if np.all(y >= 0) and np.all(y < np.array(coarse.dims)):
                            acc += dense_c[batch[i]][y[0], y[1], y[2]] @ w_up[kz * 9 + ky * 3 + kx]
        np.testing.assert_allclose(got[i], acc, rtol=1e-4, atol=1e-4)


def test_dense_conv_path_matches_sparse():
    """subm_conv_dense / sparse_conv3d_dense must equal the gather path."""
    import jax.numpy as jnp
    from fullysparsefusion_tpu.ops.sparse_conv import (
        subm_conv_dense, sparse_conv3d_dense,
    )

    rng = np.random.default_rng(11)
    cin, cout = 4, 6
    st, denses, coords, batch, n = _make_sparse(9, cin)
    st = st.replace(batch_size=2)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
    b = rng.normal(size=cout).astype(np.float32)

    ref = np.asarray(subm_conv3d(st, jnp.asarray(w), jnp.asarray(b)))
    got = np.asarray(subm_conv_dense(st, jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)  # bf16 path

    out_s = sparse_conv3d(
        st, jnp.asarray(w), None, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_capacity=128
    )
    out_d = sparse_conv3d_dense(
        st, jnp.asarray(w), None, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_capacity=128
    )
    np.testing.assert_array_equal(np.asarray(out_s.coords), np.asarray(out_d.coords))
    np.testing.assert_array_equal(np.asarray(out_s.valid), np.asarray(out_d.valid))
    np.testing.assert_allclose(
        np.asarray(out_d.feats), np.asarray(out_s.feats), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("mode", ["mul", "div"])
@pytest.mark.parametrize("padding", [(1, 1, 1), (0, 1, 1), (1, 0, 0)])
def test_pair_query_triplet_fast_path_matches_generic(mode, padding):
    """The x-triplet pair-query fast path (kernel 3³, stride 2) must agree
    exactly with the generic per-tap lookup on random active sets."""
    import fullysparsefusion_tpu.ops.sparse_conv as sc

    rng = np.random.default_rng(11)
    dims, bsz = (16, 12, 8), 2
    nx, ny, nz = dims
    n, m = 128, 96
    coords = np.stack(
        [rng.integers(0, nx, n), rng.integers(0, ny, n), rng.integers(0, nz, n)], 1
    ).astype(np.int32)
    batch = rng.integers(0, bsz, n).astype(np.int32)
    valid = rng.random(n) > 0.2
    key = ((batch * nz + coords[:, 2]) * ny + coords[:, 1]) * nx + coords[:, 0]
    _, first = np.unique(key, return_index=True)
    keep = np.zeros(n, bool)
    keep[first] = True
    valid &= keep
    qc = np.stack(
        [rng.integers(0, nx, m), rng.integers(0, ny, m), rng.integers(0, nz, m)], 1
    ).astype(np.int32)
    qb = rng.integers(0, bsz, m).astype(np.int32)
    qv = rng.random(m) > 0.1
    args = (
        jnp.asarray(qc), jnp.asarray(qb), jnp.asarray(qv),
        jnp.asarray(coords), jnp.asarray(batch), jnp.asarray(valid),
        dims, bsz, (3, 3, 3), (2, 2, 2), padding, mode,
    )
    fast = np.asarray(sc._pair_query_rows(*args))
    orig_d, orig_t = sc._use_dense, sc._use_triplets
    try:
        # force the generic sorted lookup (both the triplet fast path and
        # the dense-table middle tier off)
        sc._use_dense = lambda st: False
        sc._use_triplets = lambda st: False
        slow = np.asarray(sc._pair_query_rows(*args))
        # middle tier: dense lookup table, no triplet table
        sc._use_dense = orig_d
        mid = np.asarray(sc._pair_query_rows(*args))
    finally:
        sc._use_dense, sc._use_triplets = orig_d, orig_t
    np.testing.assert_array_equal(fast, slow)
    np.testing.assert_array_equal(fast, mid)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_subm_rulebook_tiers_agree(seed):
    """build_subm_rulebook's triplet, middle-dense, and sorted tiers must
    produce identical rows/hits on random active sets (incl. grid edges)."""
    import fullysparsefusion_tpu.ops.sparse_conv as sc

    rng = np.random.default_rng(seed)
    dims, bsz = (16, 12, 8), 2
    nx, ny, nz = dims
    n, cap = 160, 192
    coords = np.stack(
        [rng.integers(0, nx, n), rng.integers(0, ny, n), rng.integers(0, nz, n)], 1
    ).astype(np.int32)
    batch = rng.integers(0, bsz, n).astype(np.int32)
    valid = rng.random(n) > 0.2
    key = ((batch * nz + coords[:, 2]) * ny + coords[:, 1]) * nx + coords[:, 0]
    _, first = np.unique(key, return_index=True)
    keep = np.zeros(n, bool)
    keep[first] = True
    valid &= keep
    pad = cap - n
    st = SparseTensor(
        feats=jnp.zeros((cap, 1), jnp.float32),
        coords=jnp.asarray(np.pad(coords, ((0, pad), (0, 0)))),
        batch=jnp.asarray(np.pad(batch, (0, pad))),
        valid=jnp.asarray(np.pad(valid, (0, pad))),
        dims=dims, batch_size=bsz,
    )
    got = {}
    orig_d, orig_t = sc._use_dense, sc._use_triplets
    try:
        got["triplet"] = build_subm_rulebook(st)
        sc._use_triplets = lambda s: False
        got["mid"] = build_subm_rulebook(st)
        sc._use_dense = lambda s: False
        got["sorted"] = build_subm_rulebook(st)
    finally:
        sc._use_dense, sc._use_triplets = orig_d, orig_t
    ref = got.pop("sorted")
    for name, rb in got.items():
        np.testing.assert_array_equal(
            np.asarray(rb.hits), np.asarray(ref.hits), err_msg=name)
        np.testing.assert_array_equal(
            np.asarray(rb.rows) * np.asarray(rb.hits),
            np.asarray(ref.rows) * np.asarray(ref.hits), err_msg=name)
