"""Pallas kernel oracles (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fullysparsefusion_tpu.ops.pallas_kernels import ccl_sweeps_pallas, nms_scan_pallas
from fullysparsefusion_tpu.ops.nms import nms_mask_from_iou


def _uf(adj, valid):
    n = len(adj)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(n):
            if adj[i, j] and valid[i] and valid[j]:
                parent[find(i)] = find(j)
    out = np.full(n, -1)
    for i in range(n):
        if valid[i]:
            out[i] = min(j for j in range(n) if valid[j] and find(j) == find(i))
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_ccl_pallas_matches_union_find(seed):
    rng = np.random.default_rng(seed)
    g, n = 2, 128
    adjs, valids, refs = [], [], []
    for _ in range(g):
        xy = rng.uniform(0, 12, (n, 2))
        valid = rng.random(n) > 0.1
        d = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
        adj = (d < 1.2) & valid[:, None] & valid[None, :]
        np.fill_diagonal(adj, valid)
        adjs.append(adj)
        valids.append(valid)
        refs.append(_uf(adj, valid))
    got = np.asarray(
        ccl_sweeps_pallas(
            jnp.asarray(np.stack(adjs)), jnp.asarray(np.stack(valids)),
            sweeps=16, interpret=True,
        )
    )
    for gi in range(g):
        np.testing.assert_array_equal(got[gi], refs[gi])


def test_nms_pallas_matches_xla():
    rng = np.random.default_rng(3)
    n = 64
    # random symmetric IoU-like matrix in sorted-score order
    m = rng.random((n, n)).astype(np.float32)
    iou = (m + m.T) / 2
    np.fill_diagonal(iou, 1.0)
    valid = rng.random(n) > 0.15
    got = np.asarray(
        nms_scan_pallas(jnp.asarray(iou), jnp.asarray(valid), 0.6, interpret=True)
    )
    # reference: the XLA scan on the same (already sorted) order
    scores = jnp.asarray(np.linspace(1, 0.01, n, dtype=np.float32))
    ref = np.asarray(nms_mask_from_iou(jnp.asarray(iou), scores, jnp.asarray(valid), 0.6))
    np.testing.assert_array_equal(got, ref)
