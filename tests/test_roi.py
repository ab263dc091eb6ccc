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


def _brute_force_pairs(xyz, pb, pv, rois, rb, rv, extra, k):
    """Oracle: every (point, roi) membership in enlarged rotated boxes,
    keeping each point's k lowest roi indices (the paths' preference
    order). Returns (kept pair set, dropped membership count)."""
    xyz, pb, pv = np.asarray(xyz), np.asarray(pb), np.asarray(pv)
    rois, rb, rv = np.asarray(rois), np.asarray(rb), np.asarray(rv)
    ctr = rois[:, :3].copy()
    ctr[:, 2] += rois[:, 5] * 0.5  # gravity center
    half = (rois[:, 3:6] + np.asarray(extra)) * 0.5
    kept, dropped = set(), 0
    for p in range(len(xyz)):
        if not pv[p]:
            continue
        mine = []
        for r in range(len(rois)):
            if not rv[r] or rb[r] != pb[p]:
                continue
            d = xyz[p] - ctr[r]
            c, s = np.cos(-rois[r, 6]), np.sin(-rois[r, 6])
            loc = np.array([c * d[0] - s * d[1], s * d[0] + c * d[1], d[2]])
            if np.all(np.abs(loc) <= half[r]):
                mine.append(r)
        kept |= {(p, r) for r in sorted(mine)[:k]}
        dropped += max(0, len(mine) - k)
    return kept, dropped


def test_k3_matches_brute_force_oracle():
    """rois_per_point=3 (VERDICT r2 #6): both paths vs the all-pairs oracle,
    on a scene with deliberately stacked RoIs so points sit in >3 boxes."""
    rng = np.random.default_rng(42)
    n, q = 1500, 48
    xyz = rng.uniform([-20, -20, -2.5], [20, 20, 1.5], (n, 3))
    pbatch = rng.integers(0, 2, n).astype(np.int32)
    pvalid = rng.random(n) < 0.95
    rois = np.zeros((q, 7), np.float32)
    # cluster the roi centers so membership stacks deep
    rois[:, :2] = rng.uniform(-12, 12, (q, 2)) * rng.choice(
        [0.2, 1.0], (q, 1), p=[0.5, 0.5]
    )
    rois[:, 2] = rng.uniform(-2.0, -1.0, q)
    rois[:, 3:6] = rng.uniform([3.0, 3.0, 2.0], [14.0, 6.0, 4.0], (q, 3))
    rois[:, 6] = rng.uniform(-np.pi, np.pi, q)
    rbatch = rng.integers(0, 2, q).astype(np.int32)
    rvalid = rng.random(q) < 0.9
    args = (
        jnp.asarray(xyz, jnp.float32), jnp.asarray(pbatch),
        jnp.asarray(pvalid), jnp.asarray(rois), jnp.asarray(rbatch),
        jnp.asarray(rvalid),
    )
    extra = (1.0, 1.0, 1.0)
    want, want_dropped = _brute_force_pairs(*args, extra, k=3)
    assert want_dropped > 0, "scene must actually exercise the k-cap"

    scan = extract_roi_points(*args, extra, 8192, rois_per_point=3)
    assert _pairs(scan) == want
    assert int(scan.dropped) == want_dropped
    # cands_per_cell=q so no cell overflows (the deliberately stacked scene
    # covers some cells with >16 RoIs — overflow there is the grid path's
    # documented approximation, not the k-cap under test)
    grid = extract_roi_points_grid(
        *args, extra, 8192, rois_per_point=3, batch_size=2,
        bev_lo=(-22.0, -22.0), bev_hi=(22.0, 22.0), window=17,
        cands_per_cell=q,
    )
    assert _pairs(grid) == want
    assert int(grid.dropped) == want_dropped


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
