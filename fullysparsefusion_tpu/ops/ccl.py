"""Connected-component labeling over a BEV distance graph — TPU-native.

Replaces both the scipy CPU path (reference: single_stage_fsd.py:45-82,
dense N² xy-distance adjacency + scipy.sparse.csgraph.connected_components,
a host-sync bottleneck in the reference's training loop) and TorchEx's
``cc_gpu`` (single_stage_fsd.py:37-43). Semantics: two nodes are connected
iff their *xy* distance is strictly below ``dist`` AND they share a batch id;
component labels are relabeled to be compact and ordered by each component's
minimum node index (matching scipy's first-seen order, which scans nodes in
index order).

Algorithm: min-label propagation with pointer jumping ("label = label[label]")
inside a ``lax.while_loop``. Each sweep takes the min label over the masked
[N, N] adjacency; pointer jumping squares path lengths so convergence is
O(log N) sweeps. All shapes static; invalid nodes keep label N (trash).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .segment import unique_segments


def _pallas_ccl_ok(n: int) -> bool:
    """Gate for the fused Pallas sweep kernel: TPU backend and a problem
    size whose [N, N] f32 working tiles fit VMEM (N=1024 → ~9 MB)."""
    if n > 1536:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def connected_components_bev_batched(
    xy: jax.Array,        # [G, N, 2] pre-scaled so threshold is 1.0
    batch_idx: jax.Array,  # [G, N]
    valid: jax.Array,      # [G, N]
    max_iters: int = 32,
) -> jax.Array:
    """Vectorized CCL over G independent problems (per class-group).

    Distances must be pre-scaled so connectivity is ``dist < 1``.
    Returns [G, N] compact labels (-1 invalid).

    On TPU this runs the fused Pallas sweep kernel
    (:func:`..ops.pallas_kernels.ccl_sweeps_pallas`): the adjacency stays
    VMEM-resident across sweeps instead of round-tripping HBM per
    while_loop iteration. Measured (tools/microbench_ccl.py, v5e, G=6
    N=1024 clustered data): 2.51 ms vs 2.83 for the XLA while_loop, with
    100% label agreement. Each sweep does one min-propagation plus one
    pointer jump, so the covered path length after s sweeps is 2^s − 1 —
    the fixed sweep count is exact (not approximate) for any component
    diameter ≤ 2^sweeps − 1, and the gate caps N at 1536 ≪ 2^12.
    Elsewhere (CPU tests, N beyond the VMEM gate) it is the XLA
    while_loop, which iterates until convergence.
    """
    g, n = xy.shape[:2]
    if _pallas_ccl_ok(n):
        from .pallas_kernels import ccl_sweeps_pallas

        p = xy[..., :2]
        d2 = jnp.sum((p[:, :, None, :] - p[:, None, :, :]) ** 2, axis=-1)
        same = (batch_idx[:, :, None] == batch_idx[:, None, :])
        adj = (d2 < 1.0) & same & valid[:, :, None] & valid[:, None, :]
        adj = adj | (jnp.eye(n, dtype=bool)[None] & valid[:, :, None])
        sweeps = max(12, int(np.ceil(np.log2(max(n, 2)))) + 2)
        roots = ccl_sweeps_pallas(adj, valid, sweeps=sweeps)

        def relabel(lab, v):
            seg = unique_segments(lab, v, n)
            return jnp.where(v, seg.seg_id, -1).astype(jnp.int32)

        return jax.vmap(relabel)(roots, valid)
    f = jax.vmap(lambda p, b, v: connected_components_bev(p, b, v, 1.0, max_iters))
    return f(xy, batch_idx, valid)


def connected_components_bev(
    xy: jax.Array,
    batch_idx: jax.Array,
    valid: jax.Array,
    dist: float,
    max_iters: int = 64,
) -> jax.Array:
    """Compact per-node component ids, ordered by minimum node index.

    Args:
      xy: [N, 2] (or [N, 3+], extra dims ignored) node positions.
      batch_idx: [N] int32.
      valid: [N] bool.
      dist: connectivity threshold (strict <, matching the reference).

    Returns:
      labels: [N] int32 — component id in [0, n_components) for valid nodes,
      -1 for invalid ones. Component ids are assigned in ascending order of
      each component's smallest node index (scipy parity).
    """
    n = xy.shape[0]
    p = xy[:, :2]
    d2 = jnp.sum((p[:, None, :] - p[None, :, :]) ** 2, axis=-1)
    same_batch = batch_idx[:, None] == batch_idx[None, :]
    both_valid = valid[:, None] & valid[None, :]
    adj = (d2 < dist * dist) & same_batch & both_valid
    # every valid node is adjacent to itself; invalid nodes to nothing
    adj = adj | (jnp.eye(n, dtype=bool) & valid[:, None])

    big = jnp.int32(n)
    init = jnp.where(valid, jnp.arange(n, dtype=jnp.int32), big)

    def body(labels):
        # min over neighbors
        lab_mat = jnp.where(adj, labels[None, :], big)
        new = jnp.min(lab_mat, axis=1)
        new = jnp.minimum(new, labels)
        # pointer jumping: follow the label's label
        safe = jnp.clip(new, 0, n - 1)
        jumped = jnp.where(new < big, jnp.minimum(new, labels_at(labels, safe)), big)
        return jumped

    def labels_at(labels, idx):
        return labels[idx]

    def cond(state):
        labels, prev, it = state
        return (it < max_iters) & jnp.any(labels != prev)

    def step(state):
        labels, _, it = state
        return body(labels), labels, it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, step, (body(init), init, jnp.int32(0))
    )

    # relabel compactly in order of first occurrence (== min node index,
    # since the root label of each component is its min index)
    seg = unique_segments(labels, valid, n)
    out = jnp.where(valid, seg.seg_id, -1)
    return out.astype(jnp.int32)
