"""Build the C++ loader and check it against the NumPy path."""
import os
import subprocess

import numpy as np
import pytest

CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")


@pytest.fixture(scope="module")
def built_lib():
    r = subprocess.run(["make", "-C", CSRC], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    from fullysparsefusion_tpu.data import native

    assert native.available()
    return native


def test_read_points_matches_numpy(built_lib, tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(1000, 5)).astype(np.float32)
    p = tmp_path / "a.bin"
    pts.tofile(p)
    got = built_lib.read_points(str(p), 5)
    np.testing.assert_array_equal(got, pts)


def test_load_batch_transforms_and_packs(built_lib, tmp_path):
    rng = np.random.default_rng(1)
    files, rots, transs, dts, sidx, refs = [], [], [], [], [], []
    for j in range(4):
        pts = rng.normal(size=(200 + 50 * j, 4)).astype(np.float32)
        p = tmp_path / f"s{j}.bin"
        pts.tofile(p)
        files.append(str(p))
        th = rng.uniform(0, 2 * np.pi)
        R = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
            np.float32,
        )
        t = rng.normal(size=3).astype(np.float32)
        rots.append(R)
        transs.append(t)
        dts.append(0.1 * j)
        sidx.append(j // 2)
        ref = np.concatenate(
            [pts[:, :3] @ R.T + t, pts[:, 3:], np.full((len(pts), 1), 0.1 * j, np.float32)], 1
        )
        refs.append(ref)

    cap = 2048
    points, batch, n = built_lib.load_batch_native(
        files, np.stack(rots), np.stack(transs), np.asarray(dts), sidx, 4, cap
    )
    ref_all = np.concatenate(refs)
    assert n == len(ref_all)
    np.testing.assert_allclose(points[:n], ref_all, rtol=1e-5, atol=1e-5)
    ref_batch = np.concatenate([np.full(len(r), i // 2) for i, r in enumerate(refs)])
    np.testing.assert_array_equal(batch[:n], ref_batch)
    np.testing.assert_array_equal(points[n:], 0)


def test_load_batch_truncates_at_capacity(built_lib, tmp_path):
    pts = np.ones((500, 4), np.float32)
    p = tmp_path / "big.bin"
    pts.tofile(p)
    points, batch, n = built_lib.load_batch_native(
        [str(p)], None, None, None, [0], 4, cap=100
    )
    assert n == 100
