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
# Window-gather submanifold conv: DMA contiguous slot windows, gather via
# one-hot matmuls on the MXU
# ---------------------------------------------------------------------------
#
# The XLA gather engine is row-rate-bound (~380 M rows/s on v5e,
# docs/performance.md): a 27-tap conv over a 57k active set spends ~4 ms
# just issuing 1.5 M row gathers. But active slots are sorted by
# (batch, z, y, x), so the 9 taps sharing one dz read from a CONTIGUOUS
# slot window around the dz-shifted position. This kernel DMAs those three
# windows per output block (bulk, bandwidth-rate) and realizes each tap's
# within-window gather as a one-hot matmul on the MXU:
#
#   out[j] += Σ_k (iota == local_k[j]) @ window_dz(k) @ w[k]
#
# Misses and out-of-window rows get local = -1 → an all-zero one-hot row,
# so no mask multiplies are needed. Window starts are exact per-block
# minima (element granularity via dynamic-slice DMA), window size W is a
# static capacity like every other set bound in this framework; rows
# falling outside are counted by the XLA-side probe (window_overflow_count)
# — the bench scene measures 0 at W=768.


def _wg_conv_kernel(feats_hbm, lrows_ref, starts_ref, w_ref, out_ref,
                    win, sems, *, w_size: int, blk: int, cin: int,
                    cout: int, k3: int):
    copies = [
        pltpu.make_async_copy(
            feats_hbm.at[pl.ds(starts_ref[dz], w_size), :],
            win.at[dz], sems.at[dz],
        )
        for dz in range(3)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (blk, w_size), 1).astype(jnp.float32)
    acc = jnp.zeros((blk, cout), jnp.float32)
    for k in range(k3):
        l = lrows_ref[k, :].astype(jnp.float32)               # [blk]
        # float-compare one-hot (i1 tiles trip Mosaic relayouts — same
        # pattern as _ccl_kernel); miss/out-of-window is -1 → all-zero row
        oh = (jnp.abs(iota - l[:, None]) < 0.5).astype(jnp.bfloat16)
        g = jnp.dot(oh, win[k // 9].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)       # [blk, cin]
        acc = acc + jnp.dot(g.astype(jnp.bfloat16), w_ref[k],
                            preferred_element_type=jnp.float32)
    out_ref[:] = acc


def window_starts(rows: jax.Array, cap: int, blk: int, w_size: int):
    """Per-(block, dz) exact window starts + in-window local rows.

    rows: [27, cap] rulebook (miss → cap). Returns (starts [nblk, 3] i32,
    lrows [nblk, 27, blk] i32 with -1 for miss/out-of-window, overflow
    count [] i32 — real hits dropped because the block's dz-span exceeded
    ``w_size``; size windows so this is 0, like every capacity probe).
    """
    k3, n = rows.shape
    nblk = n // blk
    r = rows.reshape(k3, nblk, blk)
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    per_dz = r.reshape(3, 9, nblk, blk)
    masked = jnp.where(per_dz == cap, big, per_dz)
    starts = masked.min(axis=(1, 3))                          # [3, nblk]
    starts = jnp.minimum(starts, max(cap + 1 - w_size, 0))
    starts = jnp.maximum(starts, 0).astype(jnp.int32)         # all-miss safe
    local = per_dz - starts[:, None, :, None]
    hit = per_dz != cap
    oob = hit & ((local < 0) | (local >= w_size))
    lrows = jnp.where(hit & ~oob, local, -1).astype(jnp.int32)
    lrows = lrows.reshape(k3, nblk, blk).transpose(1, 0, 2)   # [nblk, 27, blk]
    return starts.T, lrows, oob.sum().astype(jnp.int32)


def window_gather_conv(
    feats: jax.Array,      # [cap, Cin] (zero row appended inside)
    rows: jax.Array,       # [27, cap] i32, miss → cap
    w: jax.Array,          # [27, Cin, Cout]
    w_size: int = 768,
    blk: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Σ_k feats[rows[k]] @ w[k] with f32 accumulation — the window-DMA +
    one-hot-MXU form of sparse_conv._gather_conv. Returns [cap, Cout] f32
    (caller masks by out-validity, same contract as _gather_conv)."""
    interpret = interpret or not _on_tpu()
    cap, cin = feats.shape
    k3, _ = rows.shape
    cout = w.shape[-1]
    assert cap % blk == 0, (cap, blk)
    nblk = cap // blk
    starts, lrows, _ = window_starts(rows, cap, blk, w_size)
    feats_z = jnp.concatenate(
        [feats, jnp.zeros((max(w_size - cap, 0) + 1, cin), feats.dtype)])
    kern = functools.partial(
        _wg_conv_kernel, w_size=w_size, blk=blk, cin=cin, cout=cout, k3=k3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # feats (HBM)
            pl.BlockSpec((None, k3, blk), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 3), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),           # w
        ],
        out_specs=pl.BlockSpec((blk, cout), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((3, w_size, cin), feats.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap, cout), jnp.float32),
        interpret=interpret,
    )(feats_z, lrows, starts, w.astype(jnp.bfloat16))
    return out


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
