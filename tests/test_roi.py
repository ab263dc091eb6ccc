"""RoI point pooling: the spatial-hash grid path must reproduce the exact
all-pairs scan path (same membership pairs, same geometry)."""
import numpy as np
import jax
import jax.numpy as jnp

from fullysparsefusion_tpu.models.roi import (
    extract_roi_points, extract_roi_points_grid,
)


def _scene(seed, n=3000, q=40, batch_size=2, extent=40.0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform([-extent, -extent, -2.5], [extent, extent, 1.5], (n, 3))
    pbatch = rng.integers(0, batch_size, n).astype(np.int32)
    pvalid = rng.random(n) < 0.95
    rois = np.zeros((q, 7), np.float32)
    rois[:, :2] = rng.uniform(-extent * 0.9, extent * 0.9, (q, 2))
    rois[:, 2] = rng.uniform(-2.0, -1.0, q)
    rois[:, 3:6] = rng.uniform([1.5, 1.5, 1.2], [12.0, 3.0, 3.0], (q, 3))
    rois[:, 6] = rng.uniform(-np.pi, np.pi, q)
    rbatch = rng.integers(0, batch_size, q).astype(np.int32)
    rvalid = rng.random(q) < 0.9
    return (
        jnp.asarray(xyz, jnp.float32), jnp.asarray(pbatch), jnp.asarray(pvalid),
        jnp.asarray(rois), jnp.asarray(rbatch), jnp.asarray(rvalid),
    )


def _pairs(rp):
    v = np.asarray(rp.valid)
    return set(zip(np.asarray(rp.point_idx)[v].tolist(),
                   np.asarray(rp.roi_idx)[v].tolist()))


def test_grid_matches_scan():
    for seed in range(3):
        xyz, pb, pv, rois, rb, rv = _scene(seed)
        cap = 8192
        scan = extract_roi_points(
            xyz, pb, pv, rois, rb, rv, (1.0, 1.0, 1.0), cap
        )
        grid = extract_roi_points_grid(
            xyz, pb, pv, rois, rb, rv, (1.0, 1.0, 1.0), cap,
            batch_size=2, bev_lo=(-42.0, -42.0), bev_hi=(42.0, 42.0),
        )
        ps, pg = _pairs(scan), _pairs(grid)
        assert ps == pg, (seed, len(ps), len(pg), list(ps ^ pg)[:5])
        # geometry identical for the shared pairs
        gs = {(int(p), int(r)): g for p, r, g, v in zip(
            np.asarray(scan.point_idx), np.asarray(scan.roi_idx),
            np.asarray(scan.geometry), np.asarray(scan.valid)) if v}
        gg = {(int(p), int(r)): g for p, r, g, v in zip(
            np.asarray(grid.point_idx), np.asarray(grid.roi_idx),
            np.asarray(grid.geometry), np.asarray(grid.valid)) if v}
        for k in gs:
            np.testing.assert_allclose(gs[k], gg[k], atol=1e-5)


def test_grid_jits_and_handles_empty():
    xyz, pb, pv, rois, rb, rv = _scene(7)
    f = jax.jit(lambda *a: extract_roi_points_grid(
        *a, (1.0, 1.0, 1.0), 4096, batch_size=2,
        bev_lo=(-42.0, -42.0), bev_hi=(42.0, 42.0),
    ))
    out = f(xyz, pb, pv, rois, rb, rv)
    assert bool(out.valid.any())
    # all RoIs invalid → zero pairs, finite geometry
    out2 = f(xyz, pb, pv, rois, rb, jnp.zeros_like(rv))
    assert not bool(out2.valid.any())
    assert np.isfinite(np.asarray(out2.geometry)).all()
