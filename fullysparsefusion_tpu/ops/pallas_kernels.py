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
import os
from typing import NamedTuple, Optional, Tuple

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
# (batch, z, y, x), so the 3 dx taps sharing one (dz, dy) read from a
# CONTIGUOUS slot window around the (dz, dy)-shifted position (the x-run
# of that neighbor y-row, spanning the block's own x-range). This kernel
# DMAs one [2W, Cin] window per (output block, tap group) — nine per block,
# DOUBLE-BUFFERED so block i+1's DMAs overlap block i's matmuls (the
# round-4 form waited on its DMAs every block; at ~15 µs of exposed DMA
# latency × 224 blocks that was most of the kernel's 3.2 ms) — and
# realizes each tap's within-window gather as a one-hot matmul on the MXU:
#
#   out[j] += Σ_k (iota == local_k[j]) @ window_{k//3}(j-block) @ w[k]
#
# Misses and out-of-window rows get local = -1 → an all-zero one-hot row,
# so no mask multiplies are needed. Window starts are per-block minima
# (16-row aligned for Mosaic's DMA tiling rule), window size W is a static
# capacity like every other set bound in this framework. Hits falling
# outside the window (a handful of blocks straddle z-plane / sample
# boundaries, splitting a tap group's hits into runs spanning > 2W slots)
# are repaired EXACTLY by an XLA-side residual pass: compact the
# straddling (tap-group, block) pairs to a static capacity `resid`,
# re-gather their rows, and scatter-add the masked contributions back in
# one batched matmul. Only residual-capacity overflow (straddling groups >
# resid) remains a capacity condition — size `resid` so
# FSF_DEBUG_WINDOW=1 runs stay clean.


def _wg_conv_kernel(feats_hbm, lrows_ref, starts_ref, w_ref, out_ref,
                    win, sems, *, w_size: int, blk: int, cin: int,
                    cout: int, k3: int, ngrp: int):
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    wrows = 2 * w_size

    # starts are stored PRE-DIVIDED by 16 and re-multiplied here: Mosaic
    # must *prove* the dynamic slice start divisible by the (8,128) row
    # tiling, and its affine analysis sees through x*16 but not an SMEM load
    # starts is FLAT [nblk*ngrp] in SMEM: multi-dim SMEM arrays pad the
    # minor dims to (8, 128) sublanes/lanes and blow the 1 MB SMEM budget
    def copy(b, s, g):
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(starts_ref[b * ngrp + g] * 16, wrows), :],
            win.at[s, g], sems.at[s, g],
        )

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    # DOUBLE BUFFERING: block i's windows were started by iteration i−1
    # (i=0 starts its own); start block i+1's into the other slot BEFORE
    # computing, so the nine DMAs overlap this block's 27 matmuls. The
    # round-3/4 form waited on 18 fresh DMAs every block with zero overlap —
    # per-block DMA latency (~15 µs × nblk) was the kernel's dominant cost.
    @pl.when(i == 0)
    def _():
        for g in range(ngrp):
            copy(0, 0, g).start()

    @pl.when(i + 1 < nblk)
    def _():
        for g in range(ngrp):
            copy(i + 1, nxt, g).start()

    for g in range(ngrp):
        copy(i, slot, g).wait()

    # NEGATIVE RESULT (r5, don't retry): a hierarchical one-hot (low
    # [blk,128] one-hot + per-chunk matmuls + row-level chunk select) was
    # built to attack the VPU one-hot cost — Mosaic rejects the i1
    # minor-dim broadcast the select needs ("insertion of minor dim that is
    # not a no-op only supported for 32-bit types"), and every i1-free
    # select formulation (arithmetic blend, broadcast-compare) costs 2-3
    # full [blk, cin] VPU passes per chunk, handing back the saving. The
    # flat one-hot (~4 ALU ops/element over [blk, 2W]) stands.
    acc = jnp.zeros((blk, cout), jnp.float32)
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (blk, 2 * w_size), 1).astype(jnp.float32)
    for k in range(k3):
        l = lrows_ref[k, :].astype(jnp.float32)           # [blk]
        # float-compare one-hot (i1 tiles trip Mosaic relayouts — same
        # pattern as _ccl_kernel); miss/out-of-window → all-zero row
        oh = (jnp.abs(iota - l[:, None]) < 0.5).astype(jnp.bfloat16)
        # the tap group's single [2W, cin] window: local ∈ [0, 2W)
        pair = win[slot, k // (k3 // ngrp)]
        g = jnp.dot(oh, pair.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)   # [blk, cin]
        acc = acc + jnp.dot(g.astype(jnp.bfloat16), w_ref[k],
                            preferred_element_type=jnp.float32)
    out_ref[:] = acc


def _wg_conv_kernel_p2(feats_hbm, lrows_ref, starts_ref, w_ref, out_ref,
                       win, sems, *, w_size: int, blk: int, cin: int,
                       cout: int, k3: int, ngrp: int):
    """Lane-packed variant for cin == 64: two consecutive slots share one
    128-lane row ([cap, 64] viewed as [cap/2, 128]), so each window DMA
    moves w_size packed rows covering 2·w_size slots with NO zero-lane
    padding, and the one-hot runs over w_size columns instead of 2·w_size —
    half the DMA bytes and half the gather MACs of the padded form. The
    half-select (even/odd slot) is two static lane slices + an arithmetic
    blend on the VPU."""
    i = pl.program_id(0)
    nblk = pl.num_programs(0)

    def copy(b, s, g):
        # starts are lo/16 with lo 32-aligned → lo/2 = starts·8 is 16-row
        # aligned; Mosaic's affine analysis can't see the evenness of the
        # SMEM value, so assert it
        start = pl.multiple_of(starts_ref[b * ngrp + g] * 8, 16)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, w_size), :], win.at[s, g],
            sems.at[s, g],
        )

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        for g in range(ngrp):
            copy(0, 0, g).start()

    @pl.when(i + 1 < nblk)
    def _():
        for g in range(ngrp):
            copy(i + 1, nxt, g).start()

    for g in range(ngrp):
        copy(i, slot, g).wait()

    iota = jax.lax.broadcasted_iota(
        jnp.int32, (blk, w_size), 1).astype(jnp.float32)
    acc = jnp.zeros((blk, cout), jnp.float32)
    for k in range(k3):
        l = lrows_ref[k, :]                                   # [blk] i32
        lp = (l // 2).astype(jnp.float32)                     # -1 → -1
        half = (l - 2 * (l // 2)).astype(jnp.float32)         # 0/1
        oh = (jnp.abs(iota - lp[:, None]) < 0.5).astype(jnp.bfloat16)
        pair = win[slot, k // (k3 // ngrp)]                   # [W, 2cin]
        g2 = jnp.dot(oh, pair.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)      # [blk, 2cin]
        hf = half[:, None]
        g = g2[:, :cin] * (1.0 - hf) + g2[:, cin:] * hf       # [blk, cin]
        acc = acc + jnp.dot(g.astype(jnp.bfloat16), w_ref[k],
                            preferred_element_type=jnp.float32)
    out_ref[:] = acc


def window_starts(rows: jax.Array, cap: int, blk: int, w_size: int,
                  ngrp: int = 9):
    """Per-(block, tap-group) window start + in-window local rows.

    Tap groups are runs of ``k3 // ngrp`` consecutive taps — with the
    z-major (dz, dy, dx) tap order, ``ngrp=9`` groups the 3 dx taps of one
    (dz, dy), whose hits live in a contiguous x-run of the neighbor y-row.
    Each group gets ONE window of 2·w_size rows anchored at its lowest hit.
    (Round 3/4 used two w_size windows — one at the lowest hit, one ending
    at the highest; for hit spans ≤ 2·w_size the two overlap into exactly
    the contiguous range a single 2W window covers, so the dual form bought
    nothing but a second DMA per group. Spans > 2·w_size — blocks straddling
    z-plane/sample boundaries — fall to the residual repair either way.)

    rows: [27, cap] rulebook (miss → cap). Returns (starts [nblk, ngrp]
    i32 PRE-DIVIDED by 16, lrows [nblk, 27, blk] i32 — local ∈ [0, 2W),
    -1 for miss/out-of-window,
    oob [k3, n] bool — real hits outside the window, repaired exactly by
    ``window_gather_conv``'s residual pass up to its static capacity).
    """
    k3, n = rows.shape
    nblk = n // blk
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    per_g = rows.reshape(ngrp, k3 // ngrp, nblk, blk)
    hit = per_g != cap
    masked = jnp.where(hit, per_g, big)
    # Mosaic requires dynamic-slice starts on (8,128)-tiled memrefs to be
    # tile-aligned (bf16 packs 2 rows/sublane → align 16); 32-alignment so
    # the cin=64 lane-packed kernel's halved starts stay 16-aligned too
    # (same tables serve every conv on the rulebook regardless of cin).
    # The ≤31-row slack this eats is covered by the overflow probe.
    bound = max(cap + 1 - 2 * w_size, 0) // 32 * 32
    lo = ((masked.min(axis=(1, 3)) // 32) * 32).clip(0, bound)  # [ngrp, nblk]
    l1 = per_g - lo[:, None, :, None]
    in1 = hit & (l1 >= 0) & (l1 < 2 * w_size)
    lrows = jnp.where(in1, l1, -1).astype(jnp.int32)
    lrows = lrows.reshape(k3, nblk, blk).transpose(1, 0, 2)   # [nblk, 27, blk]
    oob = (hit & ~in1).reshape(k3, n)
    return (lo // 16).transpose(1, 0).astype(jnp.int32), lrows, oob


def straddle_group_count(oob: jax.Array, blk: int, ngrp: int = 9) -> jax.Array:
    """Number of (tap-group, block) pairs carrying out-of-window hits — the
    scalar the exact-fallback dispatch in sparse_conv compares against the
    residual capacity. ``oob`` is window_starts' [k3, n] mask."""
    k3, n = oob.shape
    grp = oob.reshape(ngrp, k3 // ngrp, n // blk, blk)
    return grp.any(axis=(1, 3)).sum().astype(jnp.int32)


class WindowTables(NamedTuple):
    """Everything the window-conv path derives from the RULEBOOK alone —
    window starts, in-window local rows, the straddle count, and the
    compacted residual-repair indices. None of it depends on features or
    weights, so a UNet stage computes it ONCE per rulebook (forward tables;
    the backward's flipped-rulebook tables are pure axis flips,
    :func:`mirror_window_tables`) and every conv sharing the rulebook —
    including each conv's d_feats backward — reuses it. Round 3 recomputed
    all of this per conv, which is where the microbench-winning kernel lost
    its margin end-to-end (docs/performance.md round-4 A/B)."""

    starts16: jax.Array  # [nblk, ngrp] window starts, pre-divided by 16
    lrows: jax.Array     # [nblk, k3, blk] in-window local rows (-1 miss)
    n_grp: jax.Array     # scalar i32: straddling (tap-group, block) pairs
    rep_ok: jax.Array    # [R] f32 1/0 — repair slot occupied
    rep_b: jax.Array     # [R] i32 block index of each repair slot
    rep_src: jax.Array   # [R, tpg, blk] i32 source rows (non-oob → cap)
    rep_taps: jax.Array  # [R, tpg] i32 flat tap ids


def build_window_tables(
    rows: jax.Array, cap: int, blk: int, w_size: int, resid: int,
    ngrp: int = 9,
) -> WindowTables:
    """Precompute the full window-conv table set for one rulebook."""
    k3, n = rows.shape
    nblk = n // blk
    tpg = k3 // ngrp
    starts16, lrows, oob = window_starts(rows, cap, blk, w_size, ngrp)
    oobg = oob.reshape(ngrp, tpg, nblk, blk)
    grp_any = oobg.any(axis=(1, 3))                    # [ngrp, nblk]
    n_grp = grp_any.sum().astype(jnp.int32)
    (gi,) = jnp.nonzero(grp_any.reshape(-1), size=resid, fill_value=-1)
    ok = (gi >= 0).astype(jnp.float32)
    gsafe = jnp.maximum(gi, 0)
    g_r, b_r = gsafe // nblk, gsafe % nblk             # [R] each
    rows_g = rows.reshape(ngrp, tpg, nblk, blk)[g_r, :, b_r]   # [R, tpg, blk]
    m = oobg[g_r, :, b_r]
    src = jnp.where(m, rows_g, cap)                    # non-oob → zero row
    taps = g_r[:, None] * tpg + jnp.arange(tpg, dtype=jnp.int32)[None, :]
    return WindowTables(
        starts16=starts16, lrows=lrows, n_grp=n_grp, rep_ok=ok,
        rep_b=b_r.astype(jnp.int32), rep_src=src.astype(jnp.int32),
        rep_taps=taps,
    )


def mirror_window_tables(t: WindowTables, ngrp: int = 9) -> WindowTables:
    """Tables for the FLIPPED rulebook (``jnp.flip(rows, 0)`` — the subm
    backward's mirrored tap set, sparse_conv.mirror_rulebook): flipping taps
    reverses both the group order and the tap order within each group while
    blocks and per-group hit sets are unchanged, so every table is a pure
    axis flip / index remap of the forward's — no recomputation."""
    tpg = t.rep_taps.shape[1]
    g_r = t.rep_taps[:, 0] // tpg
    g_m = (ngrp - 1) - g_r
    taps_m = g_m[:, None] * tpg + jnp.arange(tpg, dtype=jnp.int32)[None, :]
    return WindowTables(
        starts16=t.starts16[:, ::-1],
        lrows=t.lrows[:, ::-1, :],
        n_grp=t.n_grp,
        rep_ok=t.rep_ok,
        rep_b=t.rep_b,
        rep_src=t.rep_src[:, ::-1, :],
        rep_taps=taps_m,
    )


def window_gather_conv(
    feats: jax.Array,      # [n_src, Cin] (zero row appended inside)
    rows: jax.Array,       # [27, n_out] i32, miss → n_src
    w: jax.Array,          # [27, Cin, Cout]
    w_size: int = 256,
    blk: int = 256,
    ngrp: int = 9,
    resid: int = 64,
    interpret: bool = False,
    tables: Optional[WindowTables] = None,
) -> jax.Array:
    """Σ_k feats[rows[k]] @ w[k] with f32 accumulation — the window-DMA +
    one-hot-MXU form of sparse_conv._gather_conv. Returns [n_out, Cout] f32
    (caller masks by out-validity, same contract as _gather_conv). n_out may
    differ from n_src (strided/inverse pair convs). Exact up to ``resid``
    (tap-group, block) pairs carrying out-of-window hits; beyond that the
    caller must fall back (sparse_conv's dispatch does, via lax.cond on
    ``tables.n_grp``). ``tables`` passes a precomputed :class:`WindowTables`
    (per-rulebook, shared across every conv on the same active set)."""
    interpret = interpret or not _on_tpu()
    cap, cin = feats.shape
    k3, n_out = rows.shape
    cout = w.shape[-1]
    assert n_out % blk == 0, (n_out, blk)
    nblk = n_out // blk
    wt = (tables if tables is not None
          else build_window_tables(rows, cap, blk, w_size, resid, ngrp))
    starts16, lrows = wt.starts16, wt.lrows
    # cin == 64 lane-packed kernel (two consecutive slots per 128-lane row —
    # half the DMA bytes and half the one-hot MACs of padding 64 → 128).
    # DEFAULT OFF — MEASURED LOSS on the real v5e (2026-08-20,
    # tools/microbench_window_conv.py, resid=64, within-run A/B): stage-0
    # subm 64→64 packed 4.12 ms vs 3.18 padded (r4) and ~= the XLA gather
    # 4.07; strided 64→128 packed 3.22 vs 2.41 padded (r4). The per-tap
    # [blk,128]→[blk,64] lane extracts + blend relayout on the VPU eat more
    # than the halved MACs save (the kernel is VPU-one-hot-bound, not
    # MXU/DMA-bound — ~10 µs/block of iota-compare at 2W=384). Keep the
    # code for a future Mosaic with cheap sub-lane selects; enable via
    # FSF_WINDOW_PACK2=1 for A/B only.
    pack2 = (cin == 64 and cap % 2 == 0 and w_size >= 32
             and os.environ.get("FSF_WINDOW_PACK2", "0") not in ("", "0"))
    if pack2:
        pad = max(2 * w_size - cap, 0) + 2
        feats_z = jnp.concatenate(
            [feats, jnp.zeros((pad, cin), feats.dtype)])
        feats_dma = feats_z[: (feats_z.shape[0] // 2) * 2].reshape(-1, 2 * cin)
        kern = functools.partial(
            _wg_conv_kernel_p2, w_size=w_size, blk=blk, cin=cin, cout=cout,
            k3=k3, ngrp=ngrp)
        win_shape = (2, ngrp, w_size, 2 * cin)
    else:
        # Mosaic's memref_slice needs the minor dim 128-lane aligned (a
        # 64-wide window slice is rejected even from HBM) — pad Cin to the
        # lane multiple; zero weight rows keep the math exact
        cin_p = -(-cin // 128) * 128
        if cin_p != cin:
            feats = jnp.pad(feats, ((0, 0), (0, cin_p - cin)))
            w = jnp.pad(w, ((0, 0), (0, cin_p - cin), (0, 0)))
            cin = cin_p
        feats_z = jnp.concatenate(
            [feats,
             jnp.zeros((max(2 * w_size - cap, 0) + 1, cin), feats.dtype)])
        feats_dma = feats_z
        kern = functools.partial(
            _wg_conv_kernel, w_size=w_size, blk=blk, cin=cin, cout=cout,
            k3=k3, ngrp=ngrp)
        win_shape = (2, ngrp, 2 * w_size, cin)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblk,),
        in_specs=[
            # explicit HBM: under ANY the compiler promotes feats to VMEM,
            # where a 64-lane slice trips the 128-lane tiling rule; HBM
            # sources DMA arbitrary (16-row-aligned) windows fine
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((None, k3, blk), lambda i: (i, 0, 0)),
            # whole [nblk, ngrp] table in SMEM — per-block slices violate
            # Mosaic's block-shape divisibility rule
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),           # w
        ],
        out_specs=pl.BlockSpec((blk, cout), lambda i: (i, 0)),
        scratch_shapes=[
            # two buffer slots (double buffering): block i+1's nine window
            # DMAs land in slot (i+1)%2 while block i computes from slot i%2
            pltpu.VMEM(win_shape, feats.dtype),
            pltpu.SemaphoreType.DMA((2, ngrp)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, cout), jnp.float32),
        interpret=interpret,
    )(feats_dma, lrows, starts16.reshape(-1), w.astype(jnp.bfloat16))
    if resid > 0:
        # Exact residual repair for out-of-window hits, at BLOCK-GROUP
        # granularity: only a handful of (tap-group, block) pairs straddle
        # z-plane/sample boundaries (~0.3% on the bench scene's worst
        # stage). The compaction indices (rep_*) come precomputed from the
        # rulebook (build_window_tables — nonzero over the ngrp·nblk ≈ 4k
        # group mask; entry-level nonzero over the 3M-entry mask lowers to
        # a full sort, measured +10 ms); per conv only the gather + one
        # batched bf16 matmul + scatter-add remain.
        f_r = feats_z[wt.rep_src].astype(jnp.bfloat16)    # [R, t, blk, Cin]
        w_r = w[wt.rep_taps].astype(jnp.bfloat16)         # [R, t, Cin, Cout]
        contrib = jnp.einsum(
            "rtjc,rtco->rjo", f_r, w_r,
            preferred_element_type=jnp.float32) * wt.rep_ok[:, None, None]
        # scatter-add at BLOCK granularity (R whole [blk, Cout] slices) —
        # far coarser updates than the 16k-row form (R·blk row indices)
        out = (out.reshape(nblk, blk, cout).at[wt.rep_b].add(contrib)
               .reshape(n_out, cout))
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
