"""Static-shape segment (group) operations — the TPU replacement for
torch_scatter / torch.unique.

The reference framework leans on ``torch.unique(coors, return_inverse=True)``
followed by ``torch_scatter.scatter_{max,mean,sum}`` in dozens of places
(reference: projects/mmdet3d_plugin/ops/sst_ops.py:150-177 ``scatter_v2``).
Both produce data-dependent shapes, which XLA cannot compile. Here every
group-by is expressed against a *static capacity*:

  * ``unique_segments(keys, valid, capacity)`` sorts the (masked) keys once and
    assigns each element a compact segment id in ``[0, capacity)``; invalid
    elements and overflow segments map to a trash segment at index
    ``capacity`` so downstream reduces can simply allocate ``capacity + 1``
    rows and drop the last.
  * ``segment_{sum,mean,max,min}`` are thin wrappers over
    ``jax.ops.segment_*`` with empty-segment fix-ups.
  * ``ingroup_indices`` reproduces TorchEx's ``ingroup_indices`` CUDA op
    (reference: ops/sst_ops.py:239-259) via sort + offset arithmetic.

All functions are jit-safe and differentiable where it matters (reduces are;
index computation is integer-valued and naturally non-differentiable).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

# Sentinel for "no key" — sorts to the end.
INVALID_KEY = jnp.iinfo(jnp.int32).max


@struct.dataclass
class SegmentInfo:
    """Result of a static-capacity group-by.

    Attributes:
      seg_id: [N] int32 — compact segment id per element; ``capacity`` (the
        trash segment) for invalid/overflowed elements.
      unique_keys: [capacity] int32 — the key of each segment (INVALID_KEY for
        unused slots).
      counts: [capacity] int32 — number of elements in each segment.
      num_segments: [] int32 — number of distinct valid keys encountered
        (may exceed ``capacity``; compare to detect overflow).
      seg_valid: [capacity] bool — True for slots that hold a real segment.
    """

    seg_id: jax.Array
    unique_keys: jax.Array
    counts: jax.Array
    num_segments: jax.Array
    seg_valid: jax.Array

    @property
    def capacity(self) -> int:
        return self.unique_keys.shape[0]


def unique_segments(keys: jax.Array, valid: jax.Array, capacity: int) -> SegmentInfo:
    """Compact group-by over int32 keys with a static segment capacity.

    Equivalent to ``torch.unique(keys[valid], return_inverse=True,
    return_counts=True)`` but with fixed output shapes. Segment ids are
    assigned in ascending key order (same as torch.unique's sorted output),
    so parity tests against the reference semantics are exact.
    """
    n = keys.shape[0]
    keys = keys.astype(jnp.int32)
    masked = jnp.where(valid, keys, INVALID_KEY)
    order = jnp.argsort(masked, stable=True)
    ks = masked[order]
    is_valid_sorted = ks != INVALID_KEY
    first = jnp.concatenate([ks[:1] != INVALID_KEY, (ks[1:] != ks[:-1]) & (ks[1:] != INVALID_KEY)])
    # rank of each sorted element's segment: 0-based
    ranks = jnp.cumsum(first.astype(jnp.int32)) - 1
    num_segments = jnp.sum(first.astype(jnp.int32))
    # overflow / invalid → trash segment `capacity`
    seg_sorted = jnp.where(is_valid_sorted & (ranks < capacity), ranks, capacity)
    seg_id = jnp.zeros((n,), jnp.int32).at[order].set(seg_sorted)
    unique_keys = (
        jnp.full((capacity + 1,), INVALID_KEY, jnp.int32).at[seg_sorted].set(ks)[:capacity]
    )
    counts = jax.ops.segment_sum(
        jnp.ones((n,), jnp.int32), seg_id, num_segments=capacity + 1
    )[:capacity]
    seg_valid = unique_keys != INVALID_KEY
    return SegmentInfo(
        seg_id=seg_id,
        unique_keys=unique_keys,
        counts=counts,
        num_segments=num_segments,
        seg_valid=seg_valid,
    )


def unique_keys_sorted(keys: jax.Array, valid: jax.Array, capacity: int):
    """Sorted unique keys only — no seg_id, no counts.

    ``unique_segments`` pays for an argsort (a two-operand key+iota variadic
    sort), a random-index inverse scatter for ``seg_id``, and a counts
    segment-sum; callers that only need the ascending unique key set (the
    strided-conv output active sets, ops/sparse_conv.downsample_coords —
    ~8·cap candidate keys per UNet strided conv) skip all three: one
    KEY-ONLY ``lax.sort``, boundary marks, the MXU prefix-sum rank
    (:func:`cumsum_marks`), and a single scatter into the capacity table.
    Same ordering semantics as ``unique_segments`` (ascending keys,
    overflow → dropped past ``capacity``).

    Returns ``(unique_keys [capacity] int32, seg_valid [capacity] bool,
    num_segments [] int32)``.
    """
    keys = keys.astype(jnp.int32)
    masked = jnp.where(valid, keys, INVALID_KEY)
    (ks,) = jax.lax.sort((masked,))
    ok = ks != INVALID_KEY
    first = jnp.concatenate([ok[:1], (ks[1:] != ks[:-1]) & ok[1:]])
    incl = cumsum_marks(first)                     # [n] inclusive rank+1
    num_segments = incl[-1]
    ranks = incl - 1
    slot = jnp.where(first & (ranks < capacity), ranks, capacity)
    unique_keys = (
        jnp.full((capacity + 1,), INVALID_KEY, jnp.int32).at[slot].set(ks)
    )[:capacity]
    return unique_keys, unique_keys != INVALID_KEY, num_segments


_CUMSUM_LANE = 512
_CUMSUM_BASE = 4096   # below this, plain jnp.cumsum is fine


def cumsum_marks(marks: jax.Array) -> jax.Array:
    """Inclusive prefix sum over a flat 0/1 mark vector, exact, in int32.

    XLA lowers ``jnp.cumsum`` over multi-million-element vectors to a
    log2(N) chain of shifted adds (~full-vector passes each) — measured as
    the reason the sort-free dense unique lost to the argsort path
    (docs/performance.md round-3 negatives). This form runs the scan on
    the MXU instead: rows of a [M, 512] view are prefix-summed by one
    matmul with a triangular ones matrix, and row offsets recurse on
    the 512×-smaller row totals.

    Exactness: level-one operands are 0/1 (bf16-exact) with partial sums
    ≤ 512 (f32-exact); the one possible recursive matmul level has
    operands ≤ 512 and partial sums ≤ 512² < 2²⁴ (f32-exact); vectors
    ≤ 4096 run plain int32 cumsum. Exact for N ≤ 512·512·4096 ≈ 1.07e9.
    """
    n = marks.shape[0]
    assert n <= _CUMSUM_LANE * _CUMSUM_LANE * _CUMSUM_BASE, (
        "cumsum_marks exactness bound exceeded")

    def rec(vec, top_level):
        m = vec.shape[0]
        if m <= _CUMSUM_BASE:
            return jnp.cumsum(vec.astype(jnp.int32))
        rows = -(-m // _CUMSUM_LANE)
        dt = jnp.bfloat16 if top_level else jnp.float32
        v = jnp.pad(vec.astype(dt), (0, rows * _CUMSUM_LANE - m))
        v = v.reshape(rows, _CUMSUM_LANE)
        # within[r, j] = Σ_{l ≤ j} v[r, l]  ⇒  tri[l, j] = [l ≤ j] (upper)
        tri = jnp.triu(jnp.ones((_CUMSUM_LANE, _CUMSUM_LANE), dt))
        # Recursive levels carry row totals up to 512, which bf16 cannot
        # represent above 256 — the TPU default matmul precision truncates
        # f32 operands to bf16, so force full precision there. The matrix is
        # 512× smaller than the top level, so the cost is negligible. The
        # top level stays bf16: operands are 0/1 marks (bf16-exact) and the
        # f32 accumulator holds the ≤512 partial sums exactly.
        prec = None if top_level else jax.lax.Precision.HIGHEST
        within = jax.lax.dot(
            v, tri, preferred_element_type=jnp.float32, precision=prec
        ).astype(jnp.int32)                       # [rows, L] inclusive-in-row
        tot = within[:, -1]                       # [rows] ≤ 512 each (marks)
        offs = rec(tot, False) - tot              # exclusive row offsets
        return (within + offs[:, None]).reshape(-1)[:m]

    return rec(marks, True)


def unique_segments_dense(
    keys: jax.Array, valid: jax.Array, cells: int, capacity: int
) -> SegmentInfo:
    """``unique_segments`` without the argsort, for keys known to lie in
    ``[0, cells)``: mark a dense cell grid, rank active cells with the MXU
    prefix sum (:func:`cumsum_marks`), and invert with unique-index
    scatters. Segment ids come out in ascending key order — identical
    semantics to the sorted path (property-tested in tests/test_segment.py).

    Worth it when ``cells`` is small enough that two dense passes beat an
    8·N-key argsort; call sites gate on a cell budget.
    """
    n = keys.shape[0]
    keys = keys.astype(jnp.int32)
    safe = jnp.where(valid, keys, 0).clip(0, cells - 1)
    occ = jnp.zeros((cells,), jnp.int8).at[safe].max(valid.astype(jnp.int8))
    incl = cumsum_marks(occ)                      # [cells] i32
    num_segments = incl[-1]
    rank = incl[safe] - 1                         # exclusive rank of the cell
    ok = valid & (rank < capacity)
    seg_id = jnp.where(ok, rank, capacity).astype(jnp.int32)
    unique_keys = (
        jnp.full((capacity + 1,), INVALID_KEY, jnp.int32)
        .at[seg_id].set(jnp.where(ok, keys, INVALID_KEY))[:capacity]
    )
    counts = jax.ops.segment_sum(
        jnp.ones((n,), jnp.int32), seg_id, num_segments=capacity + 1
    )[:capacity]
    return SegmentInfo(
        seg_id=seg_id,
        unique_keys=unique_keys,
        counts=counts,
        num_segments=num_segments,
        seg_valid=unique_keys != INVALID_KEY,
    )


def _num_rows(seg: SegmentInfo) -> int:
    return seg.capacity + 1


def segment_sum(feat: jax.Array, seg_id: jax.Array, capacity: int) -> jax.Array:
    """Sum-reduce rows of ``feat`` by segment id; returns [capacity, ...]."""
    out = jax.ops.segment_sum(feat, seg_id, num_segments=capacity + 1)
    return out[:capacity]


def segment_mean(
    feat: jax.Array, seg_id: jax.Array, capacity: int, counts: Optional[jax.Array] = None
) -> jax.Array:
    """Mean-reduce rows of ``feat`` by segment id (empty segments → 0)."""
    s = jax.ops.segment_sum(feat, seg_id, num_segments=capacity + 1)[:capacity]
    if counts is None:
        ones = jnp.ones((feat.shape[0],), feat.dtype)
        counts = jax.ops.segment_sum(ones, seg_id, num_segments=capacity + 1)[:capacity]
    denom = jnp.maximum(counts.astype(feat.dtype), 1)
    return s / denom.reshape((-1,) + (1,) * (feat.ndim - 1))


def segment_max(
    feat: jax.Array, seg_id: jax.Array, capacity: int, empty_value: float = 0.0
) -> jax.Array:
    """Max-reduce rows of ``feat`` by segment id (empty segments → empty_value).

    torch_scatter.scatter_max leaves empty rows at 0 when sizes come from
    unique counts (they never occur); we make the empty fill explicit.
    """
    out = jax.ops.segment_max(feat, seg_id, num_segments=capacity + 1)[:capacity]
    ones = jnp.ones((feat.shape[0],), jnp.int32)
    counts = jax.ops.segment_sum(ones, seg_id, num_segments=capacity + 1)[:capacity]
    nonempty = (counts > 0).reshape((-1,) + (1,) * (feat.ndim - 1))
    return jnp.where(nonempty, out, jnp.asarray(empty_value, feat.dtype))


def segment_min(
    feat: jax.Array, seg_id: jax.Array, capacity: int, empty_value: float = 0.0
) -> jax.Array:
    out = jax.ops.segment_min(feat, seg_id, num_segments=capacity + 1)[:capacity]
    ones = jnp.ones((feat.shape[0],), jnp.int32)
    counts = jax.ops.segment_sum(ones, seg_id, num_segments=capacity + 1)[:capacity]
    nonempty = (counts > 0).reshape((-1,) + (1,) * (feat.ndim - 1))
    return jnp.where(nonempty, out, jnp.asarray(empty_value, feat.dtype))


def sorted_unsorted_segment_sum(
    vals: jax.Array, rows: jax.Array, num_rows: int
) -> jax.Array:
    """Scatter-free unsorted segment sum: sort by row, cumsum, boundary-diff.

    The XLA TPU lowering of scatter-add with duplicate indices serializes;
    this reformulation is sort (N log N) + cumsum + 2 gathers — every step
    vectorizes. f32 accumulation regardless of ``vals`` dtype. Rows outside
    [0, num_rows) contribute nothing.
    """
    order = jnp.argsort(rows)
    vs = vals[order].astype(jnp.float32)
    rs = rows[order]
    cs = jnp.cumsum(vs, axis=0)
    cs = jnp.concatenate([jnp.zeros_like(cs[:1]), cs], axis=0)
    starts = jnp.searchsorted(rs, jnp.arange(num_rows + 1, dtype=rs.dtype))
    return (cs[starts[1:]] - cs[starts[:-1]]).astype(vals.dtype)


@jax.custom_vjp
def gather_rows(table: jax.Array, rows: jax.Array) -> jax.Array:
    """``table[rows]`` whose BACKWARD is the sort-based segment sum above.

    Use for every hot differentiable feature gather: the autodiff transpose
    of a plain gather is a TPU scatter-add over duplicate indices, which
    serializes (measured minutes per train step at production scale —
    same failure mode the sparse-conv custom VJPs fix)."""
    return table[rows]


def _gather_rows_fwd(table, rows):
    return table[rows], (rows, table.shape[0])


def _gather_rows_bwd(res, g):
    rows, n = res
    return sorted_unsorted_segment_sum(g, rows, n), None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def apply_segments(fn, feat: jax.Array, seg: SegmentInfo):
    """Convenience: fn in {'sum','mean','max','avg'} applied over a SegmentInfo."""
    if fn in ("mean", "avg"):
        return segment_mean(feat, seg.seg_id, seg.capacity, counts=seg.counts)
    if fn == "sum":
        return segment_sum(feat, seg.seg_id, seg.capacity)
    if fn == "max":
        return segment_max(feat, seg.seg_id, seg.capacity)
    raise ValueError(f"unknown reduce mode {fn!r}")


def ingroup_indices(group_ids: jax.Array, valid: jax.Array) -> jax.Array:
    """Per-element running index within its group (0..k-1), any group order.

    TPU-native version of TorchEx ``ingroup_indices`` (reference:
    ops/sst_ops.py:239-259; pure-torch algorithm documented at :190-237).
    Sort by group id (stable), subtract each group's start offset, then
    scatter back to original order. Invalid elements get -1.
    """
    n = group_ids.shape[0]
    masked = jnp.where(valid, group_ids.astype(jnp.int32), INVALID_KEY)
    order = jnp.argsort(masked, stable=True)
    gs = masked[order]
    first = jnp.concatenate([jnp.ones((1,), bool), gs[1:] != gs[:-1]])
    pos = jnp.arange(n, dtype=jnp.int32)
    # start position of each sorted element's group
    start = jnp.where(first, pos, 0)
    start = jax.lax.associative_scan(jnp.maximum, start)
    inner_sorted = pos - start
    inner = jnp.zeros((n,), jnp.int32).at[order].set(inner_sorted)
    return jnp.where(valid, inner, -1)
