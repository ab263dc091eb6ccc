"""RoI point pooling + FullySparseBboxHead — the cascade-refinement machinery.

Replaces TorchEx ``dynamic_point_pool`` + DynamicPointROIExtractor
(dynamic_point_pool_op.py, dynamic_point_roi_extractor.py:30-100) and
FullySparseBboxHead (fsd_bbox_head.py:22-197).

Static-shape reformulation: instead of emitting a variable-length
(point, roi) pair list capped at 50k, each point contributes up to
``rois_per_point`` memberships (overlapping RoIs beyond that are dropped —
RoIs rarely stack deeper than 2 after NMS-free query generation), and the
flattened membership list is compacted to a fixed ``roi_points`` capacity.
Per-pair 13-dim geometry matches the reference
(fsd_bbox_head.py:122 f_cluster): canonical local xyz (3), boundary offsets
to the 6 enlarged faces (6), in-margin flag (1), world-frame offset (3).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.segment import SegmentInfo, unique_segments, segment_max
from ..ops.geometry import gravity_center, rotate_points_z
from ..utils.gather import masked_gather
from .layers import MLP
from .vfe import SIRLayer


class RoiPoints(NamedTuple):
    point_idx: jax.Array   # [R] row into the point set
    roi_idx: jax.Array     # [R] roi index
    geometry: jax.Array    # [R, 13]
    valid: jax.Array       # [R]
    # memberships dropped because a point sat inside more than
    # ``rois_per_point`` RoIs (diagnostic, scalar int32; analogous to
    # ops.sparse_conv.check_pair_budget). The grid path additionally drops
    # RoIs past ``cands_per_cell`` per cell, which this does not count.
    dropped: jax.Array = jnp.zeros((), jnp.int32)


def _topk_maxmask(score: jax.Array, k: int, neg, idx_of):
    """Top-k of each row by k argmax/mask passes — far cheaper than
    ``lax.top_k`` on TPU for small k (measured for the k=2 case; the loop
    generalizes it). ``idx_of`` maps winning column ids [N] → payload [N].
    Returns ([N, k] scores, [N, k] payloads)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    ss, ii = [], []
    for _ in range(k):
        i1 = jnp.argmax(score, axis=1)
        ss.append(jnp.max(score, axis=1))
        ii.append(idx_of(i1))
        score = jnp.where(cols == i1[:, None], neg, score)
    return jnp.stack(ss, axis=1), jnp.stack(ii, axis=1)


def extract_roi_points(
    xyz: jax.Array,          # [N, 3]
    point_batch: jax.Array,  # [N]
    point_valid: jax.Array,  # [N]
    rois: jax.Array,         # [Q, 7+] decoded boxes
    roi_batch: jax.Array,    # [Q]
    roi_valid: jax.Array,    # [Q]
    extra_wlh: Tuple[float, float, float],
    capacity: int,
    rois_per_point: int = 2,
    roi_chunk: int = 64,
) -> RoiPoints:
    """Membership of points in enlarged rotated RoIs, with static capacity.

    The [N, Q] membership test runs in RoI chunks under ``lax.scan`` with a
    running per-point top-K — peak memory is [N, roi_chunk, 3] instead of
    [N, Q, 3] (2 GB at production scale).
    """
    q = rois.shape[0]
    n = xyz.shape[0]
    extra = jnp.asarray(extra_wlh, xyz.dtype)
    pad_q = (-q) % roi_chunk
    if pad_q:
        rois_p = jnp.concatenate([rois, jnp.zeros((pad_q, rois.shape[1]), rois.dtype)])
        roi_batch_p = jnp.concatenate([roi_batch, jnp.full((pad_q,), -1, roi_batch.dtype)])
        roi_valid_p = jnp.concatenate([roi_valid, jnp.zeros((pad_q,), bool)])
    else:
        rois_p, roi_batch_p, roi_valid_p = rois, roi_batch, roi_valid
    qc = rois_p.shape[0] // roi_chunk
    rois_c = rois_p.reshape(qc, roi_chunk, -1)
    rb_c = roi_batch_p.reshape(qc, roi_chunk)
    rv_c = roi_valid_p.reshape(qc, roi_chunk)
    base_c = jnp.arange(qc, dtype=jnp.int32) * roi_chunk

    neg = jnp.int32(-q - roi_chunk - 1)
    k = rois_per_point

    def step(carry, chunk):
        top_s, top_i, n_inside = carry            # [N, k] running best
        rc, rbc, rvc, base = chunk
        ctr = gravity_center(rc)                  # [C, 3]
        half = (rc[:, 3:6] + extra) * 0.5
        rel = xyz[:, None, :] - ctr[None, :, :]   # [N, C, 3]
        local = rotate_points_z(rel, -rc[None, :, 6])
        inside = jnp.all(jnp.abs(local) <= half[None], axis=-1)
        inside &= point_valid[:, None] & rvc[None, :]
        inside &= point_batch[:, None] == rbc[None, :]
        gidx = base + jnp.arange(roi_chunk, dtype=jnp.int32)
        score = jnp.where(inside, -gidx[None, :], neg)   # prefer lower roi idx
        cs, ci = _topk_maxmask(score, k, neg, lambda i: gidx[i])
        cand_s = jnp.concatenate([top_s, cs], axis=1)     # [N, 2k]
        cand_i = jnp.concatenate([top_i, ci], axis=1)
        cols2k = jax.lax.broadcasted_iota(jnp.int32, cand_i.shape, 1)
        # one-hot row select, not take_along_axis (slow on TPU)
        ms, mi = _topk_maxmask(
            cand_s, k, neg,
            lambda i: jnp.sum(jnp.where(cols2k == i[:, None], cand_i, 0), axis=1),
        )
        return (ms, mi, n_inside + jnp.sum(inside.astype(jnp.int32))), None

    # derive the init from a traced input so its sharding/varying axes match
    # the body outputs under shard_map (constants are unvarying by default)
    zero_nk = (xyz[:, :1] * 0).astype(jnp.int32) * jnp.zeros((1, k), jnp.int32)
    init = (zero_nk + neg, zero_nk, jnp.sum(zero_nk[:, 0]))
    (top_scores, top_idx, n_inside), _ = jax.lax.scan(
        step, init, (rois_c, rb_c, rv_c, base_c)
    )
    member_ok = top_scores > neg
    return _finalize_pairs(
        xyz, rois, member_ok, top_idx, extra, capacity, rois_per_point,
        dropped=n_inside - jnp.sum(member_ok.astype(jnp.int32)),
    )


def _finalize_pairs(
    xyz, rois, member_ok, top_idx, extra, capacity, rois_per_point,
    dropped=None,
):
    """Compact [N, k] memberships to the fixed pair list + 13-dim geometry."""
    flat_ok = member_ok.reshape(-1)
    sel, sel_valid = masked_gather(flat_ok, capacity)
    point_idx = sel // rois_per_point
    roi_idx = top_idx.reshape(-1)[sel]
    roi_idx = jnp.where(sel_valid, roi_idx, 0)

    # 13-dim geometry for the selected pairs
    p = xyz[point_idx]
    r = rois[roi_idx]
    c = gravity_center(r)
    relw = p - c
    loc = rotate_points_z(relw, -r[:, 6])
    he = (r[:, 3:6] + extra) * 0.5
    ho = r[:, 3:6] * 0.5
    boundary = jnp.concatenate([he - loc, he + loc], axis=1)  # [R, 6]
    in_margin = jnp.any(jnp.abs(loc) > ho, axis=1).astype(p.dtype)
    geometry = jnp.concatenate([loc, boundary, in_margin[:, None], relw], axis=1)
    geometry = geometry * sel_valid[:, None].astype(p.dtype)
    return RoiPoints(
        point_idx=point_idx.astype(jnp.int32),
        roi_idx=roi_idx.astype(jnp.int32),
        geometry=geometry,
        valid=sel_valid,
        dropped=(jnp.zeros((), jnp.int32) if dropped is None
                 else dropped.astype(jnp.int32)),
    )


def extract_roi_points_grid(
    xyz: jax.Array,          # [N, 3]
    point_batch: jax.Array,  # [N]
    point_valid: jax.Array,  # [N]
    rois: jax.Array,         # [Q, 7+] decoded boxes
    roi_batch: jax.Array,    # [Q]
    roi_valid: jax.Array,    # [Q]
    extra_wlh: Tuple[float, float, float],
    capacity: int,
    rois_per_point: int = 2,
    batch_size: int = 1,
    bev_lo: Tuple[float, float] = (-54.0, -54.0),
    bev_hi: Tuple[float, float] = (54.0, 54.0),
    cell: float = 2.0,
    window: int = 11,
    cands_per_cell: int = 8,
) -> RoiPoints:
    """Spatial-hash RoI membership: O(N·K) instead of O(N·Q).

    The reference's ``dynamic_point_pool`` is likewise a spatial-hash gather
    (dynamic_point_pool_op.py:5-32), not a dense all-pairs test. RoIs
    rasterize their enlarged BEV footprint onto a coarse cell grid (each
    cell keeps its ``cands_per_cell`` lowest-index covering RoIs); each
    point then tests only its own cell's candidates exactly. Matches the
    scan path whenever ≤ ``cands_per_cell`` RoIs cover a cell (RoI stacking
    after query generation is shallow; overflow drops highest-index RoIs,
    the same preference order as the scan's top-2).
    """
    q = rois.shape[0]
    k = rois_per_point
    assert k <= cands_per_cell, (
        f"rois_per_point={k} cannot exceed cands_per_cell={cands_per_cell}"
    )
    extra = jnp.asarray(extra_wlh, xyz.dtype)
    nx = int(np.ceil((bev_hi[0] - bev_lo[0]) / cell))
    ny = int(np.ceil((bev_hi[1] - bev_lo[1]) / cell))

    ptab = _roi_grid_raster(
        rois, roi_batch, roi_valid, extra, nx, ny, batch_size, cell,
        window, cands_per_cell, bev_lo,
    )
    member_ok, top_idx, n_inside = _roi_grid_lookup(
        xyz, point_batch, point_valid, ptab, rois.shape[0], extra, nx, ny,
        batch_size, cell, cands_per_cell, k, bev_lo,
    )
    return _finalize_pairs(
        xyz, rois, member_ok, top_idx, extra, capacity, k,
        dropped=n_inside - jnp.sum(member_ok.astype(jnp.int32)),
    )


def _roi_grid_raster(
    rois, roi_batch, roi_valid, extra, nx, ny, batch_size, cell,
    window, cands_per_cell, bev_lo,
):
    """Stage 1: rasterize RoIs onto the BEV cell grid → packed parameter
    table [ncells+1, kc·8] (kc candidates' 7 box params + roi index)."""
    from ..ops.segment import ingroup_indices

    q = rois.shape[0]
    ncells = batch_size * nx * ny
    kc = cands_per_cell

    # rasterize each RoI's window onto the cell grid
    ctr = gravity_center(rois)
    half = (rois[:, 3:6] + extra) * 0.5
    rad = jnp.hypot(half[:, 0], half[:, 1])  # rotated-box BEV radius
    ccx = jnp.floor((ctr[:, 0] - bev_lo[0]) / cell).astype(jnp.int32)
    ccy = jnp.floor((ctr[:, 1] - bev_lo[1]) / cell).astype(jnp.int32)
    w0 = window // 2
    oi = jnp.arange(window, dtype=jnp.int32) - w0
    ox, oy = jnp.meshgrid(oi, oi, indexing="ij")
    ox, oy = ox.reshape(-1), oy.reshape(-1)                    # [W²]
    gx = ccx[:, None] + ox[None]                               # [Q, W²]
    gy = ccy[:, None] + oy[None]
    in_grid = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
    # prune cells beyond the RoI's circumradius (+ half-cell diagonal)
    cwx = bev_lo[0] + (gx.astype(rois.dtype) + 0.5) * cell
    cwy = bev_lo[1] + (gy.astype(rois.dtype) + 0.5) * cell
    margin = rad[:, None] + cell * 0.7072
    near = (jnp.abs(cwx - ctr[:, None, 0]) <= margin) & (
        jnp.abs(cwy - ctr[:, None, 1]) <= margin
    )
    pair_ok = in_grid & near & roi_valid[:, None]
    cell_id = (roi_batch[:, None] * ny + gy) * nx + gx         # [Q, W²]
    cell_id = jnp.where(pair_ok, cell_id, ncells)              # sentinel

    flat_cell = cell_id.reshape(-1)
    flat_ok = pair_ok.reshape(-1)
    # u16 table: the [N, kc] candidate gather cost scales with row bytes
    # (same measured fact as ops/sparse_conv._table_dtype)
    tdt = jnp.uint16 if q < 65536 else jnp.int32
    table = jnp.full((ncells * kc + 1,), q, tdt)
    roi_bits = max(int(np.ceil(np.log2(max(q, 2)))), 1)
    if (ncells + 1) << roi_bits < 2**31:
        # rank-within-cell via ONE key-only sort: pack (cell, roi) into a
        # single int32 key (roi in the low bits — ascending roi within each
        # cell comes out of the sort itself), mark cell boundaries, subtract
        # each run's start. Kills the argsort's iota payload, the 155k-row
        # inverse scatter, and the rank gather that ingroup_indices pays
        # (measured at bench scale — see docs/performance.md round-5).
        flat_roi_b = jax.lax.broadcasted_iota(
            jnp.int32, cell_id.shape, 0).reshape(-1)
        key = jnp.where(
            flat_ok, (flat_cell << roi_bits) | flat_roi_b,
            jnp.int32(2**31 - 1))
        (ks,) = jax.lax.sort((key,))
        ok_s = ks != 2**31 - 1
        cell_s = ks >> roi_bits
        roi_s = ks & ((1 << roi_bits) - 1)
        pos = jnp.arange(ks.shape[0], dtype=jnp.int32)
        first = jnp.concatenate(
            [ok_s[:1], (cell_s[1:] != cell_s[:-1]) & ok_s[1:]])
        start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(first, pos, 0))
        rank_s = pos - start
        keep = ok_s & (rank_s < kc)
        slot = jnp.where(keep, cell_s * kc + rank_s, ncells * kc)
        table = table.at[slot].set(roi_s.astype(tdt), mode="drop")
    else:
        # packed key would overflow int32 — generic rank path
        flat_roi = jnp.broadcast_to(
            jnp.arange(q, dtype=jnp.int32)[:, None], cell_id.shape
        ).reshape(-1)
        # rank within cell: pairs are roi-major ascending, and
        # ingroup_indices' stable sort preserves that order — rank r ==
        # r-th lowest roi index
        rank = ingroup_indices(flat_cell, flat_ok)
        keep = flat_ok & (rank >= 0) & (rank < kc)
        slot = jnp.where(keep, flat_cell * kc + rank, ncells * kc)
        table = table.at[slot].set(flat_roi.astype(tdt), mode="drop")

    # Expand the index table into a PARAMETER table: each cell's row holds
    # its kc candidates' (6 box params + cos/sin + roi index) contiguously,
    # so the per-point lookup is ONE kc*36-byte row gather instead of kc
    # tiny roi gathers. Measured (v5e, N=131k, kc=8): the per-candidate
    # roi gather alone was 12.45 ms (1M rows, row-rate bound); the whole
    # lookup+test drops 17.6 -> 4.7 ms with the packed row. The expansion
    # itself gathers only ncells*kc (~23k) rows once per call. Yaw is
    # stored PRE-EVALUATED as (cos, sin): the rotated inside-test otherwise
    # runs sin+cos over [N, kc] on the VPU — transcendentals per (point,
    # candidate) instead of per roi.
    aug = jnp.concatenate(
        [
            rois[:, :6].astype(jnp.float32),
            jnp.cos(rois[:, 6:7]).astype(jnp.float32),
            jnp.sin(rois[:, 6:7]).astype(jnp.float32),
            jnp.arange(q, dtype=jnp.float32)[:, None],
        ],
        axis=1,
    )
    aug = jnp.concatenate([aug, jnp.full((1, 9), float(q), jnp.float32)])
    ptab = aug[table.astype(jnp.int32).clip(0, q)]             # [ncells*kc+1, 9]
    ptab = ptab[: ncells * kc].reshape(ncells, kc * 9)
    ptab = jnp.concatenate([ptab, jnp.tile(aug[q:], (1, kc))])  # [ncells+1, ·]
    return ptab


def _roi_grid_lookup(
    xyz, point_batch, point_valid, ptab, q, extra, nx, ny, batch_size,
    cell, cands_per_cell, k, bev_lo,
):
    """Stage 2: per-point candidate row gather + exact rotated test + top-k.
    Returns (member_ok [N,k], top_idx [N,k], n_inside [])."""
    ncells = batch_size * nx * ny
    kc = cands_per_cell

    # per-point candidate lookup + exact rotated test
    pcx = jnp.floor((xyz[:, 0] - bev_lo[0]) / cell).astype(jnp.int32)
    pcy = jnp.floor((xyz[:, 1] - bev_lo[1]) / cell).astype(jnp.int32)
    p_in = point_valid & (pcx >= 0) & (pcx < nx) & (pcy >= 0) & (pcy < ny)
    pcell = (point_batch * ny + pcy) * nx + pcx
    pcell = jnp.where(p_in, pcell, ncells)
    row = ptab[pcell].reshape(xyz.shape[0], kc, 9)             # [N, kc, 9]
    cand = row[..., 8].astype(jnp.int32)                       # exact for q < 2^24
    cand_ok = (cand < q) & p_in[:, None]
    safe = cand.clip(0, q - 1)
    r = row.astype(xyz.dtype)                                  # [N, kc, 9]
    # gravity center inline (z + dz/2); rotation by −yaw from the packed
    # (cos, sin) — no per-(point, candidate) transcendentals
    rel_x = xyz[:, None, 0] - r[..., 0]
    rel_y = xyz[:, None, 1] - r[..., 1]
    rel_z = xyz[:, None, 2] - (r[..., 2] + r[..., 5] * 0.5)
    cy, sy = r[..., 6], r[..., 7]
    loc_x = rel_x * cy + rel_y * sy
    loc_y = -rel_x * sy + rel_y * cy
    half = (r[..., 3:6] + extra) * 0.5
    inside = (
        (jnp.abs(loc_x) <= half[..., 0])
        & (jnp.abs(loc_y) <= half[..., 1])
        & (jnp.abs(rel_z) <= half[..., 2])
    )
    inside &= cand_ok

    neg = jnp.int32(-q - 2)
    score = jnp.where(inside, -safe, neg)
    cols = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    # one-hot row selects (not take_along_axis — slow dynamic minor-dim
    # indexing on TPU)
    top_scores, top_idx = _topk_maxmask(
        score, k, neg,
        lambda i: jnp.sum(jnp.where(cols == i[:, None], safe, 0), axis=1),
    )
    member_ok = top_scores > neg
    return member_ok, top_idx, jnp.sum(inside.astype(jnp.int32))


class FullySparseBboxHead(nn.Module):
    """3 SIR blocks over (roi) groups → per-roi features (768-d).

    Matches fsd_bbox_head.py:96-151: block input is
    cat(point_channels, running feats, geometry/10); rel features are the
    13-dim geometry; per-roi output concatenates every block's reduced
    features and is aligned back to roi order.
    """

    num_blocks: int = 3
    feat_channels: Sequence[Sequence[int]] = ((128, 128),) * 3
    rel_mlp_hidden: Sequence[Sequence[int]] = ((16, 32),) * 3
    xyz_normalizer: Tuple[float, float, float] = (20.0, 20.0, 4.0)
    act: str = "gelu"

    @nn.compact
    def __call__(
        self,
        points: jax.Array,     # [R, D] point channels of selected pairs
        feats: jax.Array,      # [R, C] per-pair input features
        geometry: jax.Array,   # [R, 13]
        roi_idx: jax.Array,    # [R]
        valid: jax.Array,      # [R]
        num_rois: int,
        train: bool = False,
    ):
        seg = SegmentInfo(
            seg_id=jnp.where(valid, roi_idx, num_rois),
            unique_keys=jnp.arange(num_rois, dtype=jnp.int32),
            counts=jnp.zeros((num_rois,), jnp.int32),
            num_segments=jnp.asarray(num_rois, jnp.int32),
            seg_valid=jnp.ones((num_rois,), bool),
        )
        norm_xyz = points[:, :3] / jnp.asarray(self.xyz_normalizer, points.dtype)
        pts = jnp.concatenate([norm_xyz, points[:, 3:]], axis=1)
        out_feats = feats
        cluster_list = []
        for i in range(self.num_blocks):
            in_feats = jnp.concatenate([pts, out_feats, geometry / 10.0], axis=1)
            out_feats, cluster_feats = SIRLayer(
                feat_channels=tuple(self.feat_channels[i]),
                rel_mlp_hidden_dims=tuple(self.rel_mlp_hidden[i]),
                act=self.act,
            )(in_feats, geometry, seg, valid, train)
            cluster_list.append(cluster_feats)
        roi_feats = jnp.concatenate(cluster_list, axis=1)  # [num_rois, Σ]
        ones = jnp.zeros((points.shape[0],), jnp.float32) + valid
        nonempty = segment_max(ones, seg.seg_id, num_rois) > 0
        return roi_feats * nonempty[:, None], nonempty
