"""Pallas TPU kernels for the iteration-heavy hot ops.

XLA handles the big gather-matmul chains well, but two ops suffer from
per-iteration dispatch overhead in pure XLA:

  * CCL label propagation (`ops/ccl.py`): a while_loop whose body is tiny
    ([N,N] masked min) — here the adjacency matrix stays resident in VMEM
    and a fixed number of sweeps runs inside one kernel. The pointer-jumping
    gather (labels[labels]) is expressed as a one-hot matmul on the MXU
    (VMEM dynamic gathers are the thing to avoid on TPU).
  * Greedy NMS suppression (`ops/nms.py`): a sequential fori_loop over
    score-sorted boxes — here the IoU matrix is VMEM-resident and the scan
    runs in-kernel.

Both have XLA fallbacks (interpret=True under tests / non-TPU backends).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# CCL: fixed-sweep min-label propagation, one grid step per group
# ---------------------------------------------------------------------------


def _ccl_kernel(adj_ref, valid_ref, labels_ref, *, n: int, sweeps: int):
    # arithmetic masking throughout — large i1 vectors trip Mosaic relayouts
    adj = adj_ref[:].astype(jnp.float32)       # [N, N] 0/1
    validf = valid_ref[:].astype(jnp.float32)  # [1, N]
    big = jnp.float32(n)
    iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)
    labels = iota_row * validf + big * (1.0 - validf)              # [1, N]

    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1).astype(jnp.float32)

    def body(_, labels):
        lab_row = jnp.broadcast_to(labels, (n, n))
        lab_mat = adj * lab_row + (1.0 - adj) * big                # [N, N]
        new = jnp.min(lab_mat, axis=1, keepdims=True).T            # [1, N]
        new = jnp.minimum(new, labels)
        # pointer jumping: jumped[i] = labels[new[i]], expressed as a masked
        # min over the same [N, N] tile (cheaper than a one-hot matmul)
        sel = (jnp.abs(new.T - col) < 0.5).astype(jnp.float32)     # [N, N]
        jumped_col = jnp.min(
            sel * lab_row + (1.0 - sel) * big, axis=1, keepdims=True
        )                                                          # [N, 1]
        jumped = jumped_col.T
        out = jnp.minimum(new, jumped)
        return out * validf + big * (1.0 - validf)

    labels = jax.lax.fori_loop(0, sweeps, body, labels)
    labels_ref[:] = (labels * validf - (1.0 - validf)).astype(jnp.int32)


def ccl_sweeps_pallas(
    adj: jax.Array,     # [G, N, N] bool/int8 — symmetric adjacency incl. self
    valid: jax.Array,   # [G, N]
    sweeps: int = 12,
    interpret: bool = False,
) -> jax.Array:
    """Root labels per node (min reachable index) after fixed sweeps; -1
    invalid. Compact relabeling stays outside (ops/ccl.py)."""
    g, n, _ = adj.shape
    kern = functools.partial(_ccl_kernel, n=n, sweeps=sweeps)
    return pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.ANY)
            if False else pl.BlockSpec((None, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, n), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, 1, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, 1, n), jnp.int32),
        interpret=interpret,
    )(adj.astype(jnp.int8), valid.astype(jnp.int8)[:, None, :])[:, 0, :]


# ---------------------------------------------------------------------------
# NMS: sequential greedy suppression over a VMEM-resident IoU matrix
# ---------------------------------------------------------------------------


def _nms_kernel(iou_ref, valid_ref, thr_ref, keep_ref, *, n: int):
    validf = valid_ref[:].astype(jnp.float32)   # [1, N]
    thr = thr_ref[0, 0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(i, state):
        keep, sup = state       # [1, N] f32 each
        onehot_i = (iota == i).astype(jnp.float32)
        # scalar reads via one-hot reductions (no value dynamic_slice on TPU)
        sup_i = jnp.sum(sup * onehot_i)
        v_i = jnp.sum(validf * onehot_i)
        canf = v_i * (1.0 - jnp.minimum(sup_i, 1.0))
        keep = keep + onehot_i * canf
        row = iou_ref[pl.ds(i, 1), :]            # [1, N] from VMEM ref
        sup = jnp.maximum(sup, (row > thr).astype(jnp.float32) * canf)
        return keep, sup

    keep, _ = jax.lax.fori_loop(
        0, n, body,
        (jnp.zeros((1, n), jnp.float32), jnp.zeros((1, n), jnp.float32)),
    )
    keep_ref[:] = (keep > 0.5).astype(jnp.int8)


def nms_scan_pallas(
    iou_sorted: jax.Array,   # [N, N] f32, rows/cols in descending-score order
    valid_sorted: jax.Array,  # [N]
    iou_thr: float,
    interpret: bool = False,
) -> jax.Array:
    """Keep mask (sorted order) for greedy NMS."""
    n = iou_sorted.shape[0]
    thr = jnp.full((1, 1), iou_thr, jnp.float32)
    keep = pl.pallas_call(
        functools.partial(_nms_kernel, n=n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int8),
        interpret=interpret,
    )(iou_sorted, valid_sorted.astype(jnp.int8)[None, :], thr)
    return keep[0] > 0
