"""SingleStageFSD — the LiDAR-query branch.

Re-design of the reference SingleStageFSD (single_stage_fsd.py:380-903):

  segmentor → 0.1 m pre-voxelize dedup → group_sample (softmax foreground
  extraction per class-group with max-logit-weighted vote centers,
  :802-875) → per-group clustering (class-specific voxelization +
  connected components, ClusterAssigner :905-982) → SIR over
  (group, batch, cluster) segments → SparseClusterHeadV2.

Every data-dependent set is compacted into a static capacity with
``masked_gather``; clusters are linearized (group, batch, label) keys fed to
one ``unique_segments`` (the reference's ``unique_once``).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import FSDConfig
from ..ops.segment import SegmentInfo, unique_segments, segment_mean
from ..ops.voxelize import voxel_coords, grid_dims, linearize_coords
from ..ops.ccl import connected_components_bev, connected_components_bev_batched
from ..utils.containers import PointBatch, GroundTruth
from ..utils.gather import masked_gather
from .segmentor import VoteSegmentor, segmentor_targets, segmentor_loss
from .sir import SIR
from .heads import (
    SparseClusterHead, cluster_head_loss, cluster_head_get_bboxes,
    multi_task_cluster_head_loss, multi_task_get_bboxes,
)


class ForegroundSet(NamedTuple):
    """Compacted per-group foreground points (concatenated across groups)."""

    points: jax.Array        # [F, D] original point channels
    feats: jax.Array         # [F, Cf] logits+votes+seg_feats
    centers: jax.Array       # [F, 3] voted centers
    batch_idx: jax.Array     # [F]
    group_idx: jax.Array     # [F]
    valid: jax.Array         # [F]


def _force_one_fg_per_sample(
    fg: jax.Array, batch_idx: jax.Array, valid: jax.Array, batch_size: int
) -> jax.Array:
    """Guarantee ≥1 foreground point per sample (single_stage_fsd.py:832-834
    and :709-711): any sample whose group mask came up empty gets its first
    valid point forced to foreground, so early training (segmentor below
    threshold everywhere) still feeds each sample one cluster candidate.
    Static-shape form: [B, n] masked reductions (batch_size is small and
    static) — invalid rows can never be forced. Scatter-free on purpose:
    the original segment_sum/segment_min/scatter form measured 4.98 ms for
    the 6 group calls at bench scale (65k rows) — nearly half the fsd
    group-gather band — because TPU scatters serialize per update row;
    plain reductions over a [B, n] mask are HBM-passes (~0.1 ms)
    (tools/microbench_compaction.py, 2026-08-20)."""
    n = fg.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    sample = batch_idx[None, :] == jnp.arange(
        batch_size, dtype=batch_idx.dtype)[:, None]          # [B, n]
    sv = sample & valid[None, :]
    has_fg = jnp.any(sv & fg[None, :], axis=1)               # [B]
    first = jnp.min(jnp.where(sv, iota[None, :], n), axis=1)  # [B]
    force_slot = jnp.where(~has_fg & (first < n), first, -1)  # [B]
    b_ok = (batch_idx >= 0) & (batch_idx < batch_size)
    forced = valid & b_ok & (
        force_slot[batch_idx.clip(0, batch_size - 1)] == iota)
    return fg | forced


def group_sample(
    seg_logits: jax.Array,   # [P, C+1]
    offsets: jax.Array,      # [P, (C+1)*3] decoded vote offsets
    xyz: jax.Array,          # [P, 3]
    valid: jax.Array,
    cfg: FSDConfig,
    thresh_buffer=0.0,       # scalar added to every group threshold
                              # (EnableFSDDetectionHookIter decay,
                              # single_stage_fsd.py:751-755)
    batch_idx: Optional[jax.Array] = None,
    batch_size: int = 1,
) -> Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
    """Per-group foreground masks + voted centers (single_stage_fsd.py:802-875).

    Scores are softmax over (C+1); a group's score is the sum of its member
    classes; the vote offset is the member-class offset weighted by a one-hot
    (tie-split) of the max member logit (offset_weight='max', :867-875).
    When ``batch_idx`` is given, each sample is guaranteed ≥1 foreground
    point per group (:832-834).
    """
    num_classes = cfg.num_classes
    scores = jax.nn.softmax(seg_logits, axis=1)[:, :num_classes]
    off = offsets.reshape(-1, num_classes + 1, 3)
    fg_masks, centers = [], []
    for g, cls_ids in enumerate(cfg.group_class_ids()):
        ids = jnp.asarray(cls_ids)
        g_score = scores[:, ids].sum(axis=1)
        fg = valid & (g_score > cfg.score_thresh[g] + thresh_buffer)
        if batch_idx is not None:
            fg = _force_one_fg_per_sample(fg, batch_idx, valid, batch_size)
        logits_g = seg_logits[:, ids]
        mx = jnp.max(logits_g, axis=1, keepdims=True)
        w = (jnp.abs(logits_g - mx) < 1e-6).astype(off.dtype)
        w = w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-6)
        off_g = jnp.einsum("pc,pcd->pd", w, off[:, ids, :])
        fg_masks.append(fg)
        centers.append(xyz + off_g)
    return tuple(fg_masks), tuple(centers)


def _cluster_voxelize_group(
    centers: jax.Array, batch_idx: jax.Array, valid: jax.Array,
    group_id: int, cfg: FSDConfig,
):
    """Voxelize voted centers with the group's voxel size and drop
    near-empty voxels; returns the grouping plus per-voxel CCL inputs."""
    vsize = cfg.cluster_voxel_sizes[group_id]
    pc_range = cfg.segmentor.point_cloud_range
    vcap = cfg.caps.cluster_voxels_per_group
    coords, in_range = voxel_coords(centers, vsize, pc_range)
    ok = valid & in_range
    dims = grid_dims(vsize, pc_range)
    keys = linearize_coords(coords, batch_idx, dims)
    seg = unique_segments(keys, ok, vcap)
    ok = ok & (seg.seg_id < vcap)
    cnt_per_point = seg.counts[seg.seg_id.clip(0, vcap - 1)]
    ok = ok & (cnt_per_point >= cfg.min_cluster_points)
    vox_nonempty = seg.seg_valid & (seg.counts >= cfg.min_cluster_points)
    vox_centers = segment_mean(centers, seg.seg_id, vcap, counts=seg.counts)
    vox_batch = segment_mean(
        batch_idx.astype(jnp.float32), seg.seg_id, vcap, counts=seg.counts
    ).astype(jnp.int32)
    return seg, ok, vox_centers, vox_batch, vox_nonempty


def cluster_one_group(
    centers: jax.Array,     # [K, 3] voted centers (compacted)
    batch_idx: jax.Array,   # [K]
    valid: jax.Array,       # [K]
    group_id: int,
    cfg: FSDConfig,
) -> Tuple[jax.Array, jax.Array]:
    """ClusterAssigner for one group (single_stage_fsd.py:936-982).

    Voxelize voted centers with the group's voxel size, drop voxels with
    fewer than min_points members, CCL over voxel mean centers (xy distance
    < connected_dist within batch), map labels back per point.

    Returns (cluster_label [K] int32 (-1 invalid), point_valid [K]).
    """
    vcap = cfg.caps.cluster_voxels_per_group
    seg, ok, vox_centers, vox_batch, vox_nonempty = _cluster_voxelize_group(
        centers, batch_idx, valid, group_id, cfg
    )
    labels_vox = connected_components_bev(
        vox_centers[:, :2], vox_batch, vox_nonempty, cfg.connected_dists[group_id]
    )
    lab = labels_vox[seg.seg_id.clip(0, vcap - 1)]
    lab = jnp.where(ok, lab, -1)
    return lab.astype(jnp.int32), ok


def _per_sample_slots(seg: SegmentInfo, batch_size: int, cells: int, vps: int):
    """Per-sample re-slotting of a batch-major compact segment table.

    ``unique_segments`` assigns slots in ascending key order with all valid
    slots a prefix, and :func:`linearize_coords` keys are (batch, z, y, x)
    row-major — so each sample's voxels occupy one contiguous slot run.
    Re-slotting to ``batch_size`` runs of ``vps`` slots each is then a pure
    gather (no scatter/sort).

    Returns (start [B] — each sample's first global slot,
    gather_idx [B·vps] — global slot feeding per-sample slot (b, r),
    gather_valid [B·vps]). Samples whose voxel count exceeds ``vps`` drop
    their highest keys, matching the global capacity's truncation order.
    """
    vcap = seg.capacity
    slot_b = jnp.where(seg.seg_valid, seg.unique_keys // cells, batch_size)
    cnt_b = jax.ops.segment_sum(
        jnp.ones((vcap,), jnp.int32), slot_b, num_segments=batch_size + 1
    )[:batch_size]
    start = jnp.cumsum(cnt_b) - cnt_b
    r = jnp.arange(vps, dtype=jnp.int32)
    gather_idx = (start[:, None] + r[None, :]).reshape(-1)
    gather_valid = (r[None, :] < jnp.minimum(cnt_b, vps)[:, None]).reshape(-1)
    return start, gather_idx.clip(0, vcap - 1), gather_valid


def cluster_all_groups(
    centers_list, batch_list, valid_list, cfg: FSDConfig, batch_size: int = 1
):
    """All groups' CCL as G·B independent per-sample problems in one batched
    call (coords pre-scaled by each group's connected_dist so the threshold
    is uniform).

    Voxel slots are re-slotted per sample (``_per_sample_slots``) before the
    CCL, so each problem has N = vcap // batch_size nodes: total CCL work is
    G·B·N² — LINEAR in batch size. The previous batch-mixed layout ran G
    problems of B·N nodes (G·B²·N², quadratic in B — the measured batch-2
    throughput regression, docs/performance.md) and kept N above the Pallas
    kernel's VMEM gate at batch ≥ 2.

    Returns per-group (label [K], point_valid [K]) lists; labels are compact
    within each (group, sample) — downstream keys include the batch id, so
    cross-sample label collisions are impossible.

    CAPACITY NOTE: the per-sample re-slotting caps each sample at
    ``vcap // batch_size`` voxels, so ``caps.cluster_voxels_per_group`` must
    be provisioned as batch_size × the worst SINGLE-SAMPLE voxel count — a
    skewed batch where one sample exceeds vcap/B truncates that sample's
    highest-key clusters even though the global table had room. The drop is
    surfaced like the pair/window budget probes: FSF_DEBUG_CAPACITY=1
    prints when any sample overflows its per-sample run.
    """
    import os as _os

    vcap = cfg.caps.cluster_voxels_per_group
    vps = max(vcap // max(batch_size, 1), 1)
    pc_range = cfg.segmentor.point_cloud_range
    xys, vns, per_group = [], [], []
    for g in range(cfg.num_groups):
        seg, ok, vc, _vb, vn = _cluster_voxelize_group(
            centers_list[g], batch_list[g], valid_list[g], g, cfg
        )
        dims = grid_dims(cfg.cluster_voxel_sizes[g], pc_range)
        cells = dims[0] * dims[1] * dims[2]
        start, gidx, gok = _per_sample_slots(seg, batch_size, cells, vps)
        if _os.environ.get("FSF_DEBUG_CAPACITY", "0") not in ("", "0"):
            slot_b = jnp.where(
                seg.seg_valid, seg.unique_keys // cells, batch_size)
            cnt_b = jax.ops.segment_sum(
                jnp.ones((vcap,), jnp.int32), slot_b,
                num_segments=batch_size + 1)[:batch_size]
            jax.lax.cond(
                (cnt_b > vps).any(),
                lambda c: jax.debug.print(
                    "CLUSTER PER-SAMPLE OVERFLOW [group=" + str(g)
                    + "]: per-sample voxel counts {c} exceed vps="
                    + str(vps) + " (raise caps.cluster_voxels_per_group)",
                    c=c),
                lambda c: None, cnt_b)
        xy = (vc[:, :2] / cfg.connected_dists[g])[gidx]
        xys.append(xy.reshape(batch_size, vps, 2))
        vns.append((gok & vn[gidx]).reshape(batch_size, vps))
        per_group.append((seg, ok, start))
    nprob = cfg.num_groups * batch_size
    labels = connected_components_bev_batched(
        jnp.stack(xys).reshape(nprob, vps, 2),
        jnp.zeros((nprob, vps), jnp.int32),
        jnp.stack(vns).reshape(nprob, vps),
    ).reshape(cfg.num_groups, batch_size * vps)
    out = []
    for g in range(cfg.num_groups):
        seg, ok, start = per_group[g]
        b = batch_list[g].clip(0, batch_size - 1)
        r = seg.seg_id - start[b]
        ok = ok & (r >= 0) & (r < vps)
        lab = labels[g][b * vps + r.clip(0, vps - 1)]
        out.append((jnp.where(ok, lab, -1).astype(jnp.int32), ok))
    return out


def hybrid_cluster_one_group(
    centers: jax.Array,
    batch_idx: jax.Array,
    valid: jax.Array,
    group_id: int,
    cfg: FSDConfig,
    method: str = "ccl",
    num_fps: int = 256,
    radius: float = 1.0,
    max_batch: int = 8,
    batch_size: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-class clustering dispatch (reference HybridAssigner,
    single_stage_fsd.py:1087-1177): 'ccl' → connected components,
    'ssg' → FPS + ball grouping.

    The 'ssg' path vmaps over batch elements (one fused FPS scan with
    batched operands instead of ``batch_size`` unrolled scans): pass
    ``batch_size`` (the static batch) and it is used directly; with only
    ``max_batch`` given, samples with batch_idx ≥ max_batch would
    silently get no clusters, so prefer ``batch_size``.
    """
    if method == "ccl":
        return cluster_one_group(centers, batch_idx, valid, group_id, cfg)
    from ..ops.fps import ssg_cluster

    if batch_size is not None:
        max_batch = batch_size
    # ssg operates per batch element; offset labels to keep them disjoint
    masks = valid[None, :] & (
        batch_idx[None, :] == jnp.arange(max_batch, dtype=batch_idx.dtype)[:, None]
    )
    lab_all = jax.vmap(
        lambda m: ssg_cluster(centers, batch_idx, m, num_fps, radius)
    )(masks)                                         # [max_batch, K]
    own = lab_all[batch_idx.clip(0, max_batch - 1), jnp.arange(centers.shape[0])]
    in_range = batch_idx < max_batch
    lab = jnp.where(
        valid & in_range & (own >= 0), own + batch_idx * num_fps, -1
    ).astype(jnp.int32)
    return lab, valid & (lab >= 0)


class FSDQueryBranch(nn.Module):
    """Clustering + SIR + head: turns segmentor output into LiDAR queries.

    Shared between SingleStageFSD and FSF (which composes it with the camera
    branch — fsd_forward, FSF.py:569-605).
    """

    cfg: FSDConfig

    def setup(self):
        c = self.cfg
        self.backbone = SIR(
            num_blocks=c.sir_num_blocks,
            feat_channels=c.sir_feat_channels,
            rel_mlp_hidden_dims=c.sir_rel_mlp_hidden,
            xyz_normalizer=c.sir_xyz_normalizer,
        )
        self.bbox_head = SparseClusterHead(
            cfg=c.head, tasks=c.task_tuple(), class_names=c.class_names
        )

    def extract_foreground(
        self, pb: PointBatch, seg_out, batch_size: int, thresh_buffer=0.0
    ):
        """pre-voxelize → group_sample → per-group cluster → combined set.

        Returns (fg: ForegroundSet, cluster_label [F], seg: SegmentInfo,
        cluster_xyz [clusters,3], cluster_batch, cluster_valid).
        """
        c = self.cfg
        from ..ops.voxelize import voxelize_points

        # 0.1 m pre-voxelize dedup (single_stage_fsd.py:585-605)
        data = dict(
            points=pb.points,
            logits=seg_out["seg_logits"],
            votes=seg_out["vote_preds"],
            feats=seg_out["seg_feats"],
            offsets=seg_out["offsets"],
        )
        valid = seg_out["valid"]
        pvseg, _, pv_batch, _ = voxelize_points(
            pb.xyz, pb.batch_idx, valid,
            c.pre_voxel_size, c.segmentor.point_cloud_range, c.caps.prevox,
        )
        # NEGATIVE RESULT (r5, don't retry): fusing these five segment_means
        # into ONE concatenated [N, ~160] segment_sum measured a wash in
        # isolation (prevox 7.99 → 8.20 ms) but a +7 ms FULL-BENCH loss
        # (92.0 → 99.0 ms/frame, bisected 2026-08-20) — the 84 MB concat
        # materialization displaces XLA's fusion of the per-key reduces into
        # their consumers. Keep the per-key form.
        red = {
            k: segment_mean(v, pvseg.seg_id, c.caps.prevox, counts=pvseg.counts)
            for k, v in data.items()
        }
        pv_valid = pvseg.seg_valid

        fg_masks, centers = group_sample(
            red["logits"], red["offsets"], red["points"][:, :3], pv_valid, c,
            thresh_buffer, batch_idx=pv_batch, batch_size=batch_size,
        )

        # compact each group's foreground to a static capacity
        kcap = c.caps.fg_per_group
        g_points, g_feats, g_centers, g_batch, g_group, g_valid = [], [], [], [], [], []
        feats_all = jnp.concatenate([red["logits"], red["votes"], red["feats"]], axis=1)
        cen_list, bat_list, v_list = [], [], []
        for g in range(c.num_groups):
            idx, v = masked_gather(fg_masks[g], kcap)
            g_points.append(red["points"][idx])
            g_feats.append(feats_all[idx])
            cen_list.append(centers[g][idx])
            bat_list.append(pv_batch[idx])
            v_list.append(v)
            g_group.append(jnp.full((kcap,), g, jnp.int32))
        # all groups' CCL in one batched call, per-sample problems
        clustered = cluster_all_groups(cen_list, bat_list, v_list, c, batch_size)
        g_labels = [lab for lab, _ in clustered]
        g_valid = [ok for _, ok in clustered]
        g_centers = cen_list
        g_batch = bat_list

        fg = ForegroundSet(
            points=jnp.concatenate(g_points),
            feats=jnp.concatenate(g_feats),
            centers=jnp.concatenate(g_centers),
            batch_idx=jnp.concatenate(g_batch),
            group_idx=jnp.concatenate(g_group),
            valid=jnp.concatenate(g_valid),
        )
        labels = jnp.concatenate(g_labels)

        # linearize (group, batch, label) → cluster segments
        vcap = c.caps.cluster_voxels_per_group
        key = (fg.group_idx * batch_size + fg.batch_idx) * vcap + labels.clip(0)
        ok = fg.valid & (labels >= 0)
        cseg = unique_segments(key, ok, c.caps.clusters)
        fg = fg._replace(valid=ok & (cseg.seg_id < c.caps.clusters))

        cluster_xyz = segment_mean(
            fg.centers, cseg.seg_id, c.caps.clusters, counts=cseg.counts
        )
        cluster_batch = segment_mean(
            fg.batch_idx.astype(jnp.float32), cseg.seg_id, c.caps.clusters,
            counts=cseg.counts,
        ).astype(jnp.int32)
        cluster_group = segment_mean(
            fg.group_idx.astype(jnp.float32), cseg.seg_id, c.caps.clusters,
            counts=cseg.counts,
        ).astype(jnp.int32)
        return fg, cseg, cluster_xyz, cluster_batch, cluster_group, cseg.seg_valid

    def extract_feat(self, fg: ForegroundSet, cseg: SegmentInfo, cluster_xyz, train):
        """SIR over cluster segments (single_stage_fsd.py:458-474)."""
        sid = cseg.seg_id.clip(0, self.cfg.caps.clusters - 1)
        f_cluster = fg.points[:, :3] - cluster_xyz[sid]
        pt_feats, cluster_feats = self.backbone(
            fg.points, fg.feats, f_cluster, cseg, fg.valid, train
        )
        return pt_feats, cluster_feats

    def __call__(
        self, pb: PointBatch, seg_out, batch_size: int, train: bool = False,
        thresh_buffer=0.0,
    ):
        fg, cseg, cluster_xyz, cluster_batch, cluster_group, cluster_valid = (
            self.extract_foreground(pb, seg_out, batch_size, thresh_buffer)
        )
        pt_feats, cluster_feats = self.extract_feat(fg, cseg, cluster_xyz, train)
        outs = self.bbox_head(cluster_feats, cluster_valid, train)
        result = dict(
            obj_feat=cluster_feats,
            cluster_xyz=cluster_xyz,
            cluster_batch=cluster_batch,
            cluster_group=cluster_group,
            cluster_valid=cluster_valid,
            cls_logits_tasks=outs["cls_logits"],
            reg_preds_tasks=outs["reg_preds"],
            num_clusters=jnp.sum(cluster_valid.astype(jnp.int32)),
            num_fg_points=jnp.sum(fg.valid.astype(jnp.int32)),
        )
        if len(self.cfg.task_tuple()) == 1:
            # single-task scalars for the FSF fusion path (the shipped FSF
            # configs always run one task of all classes)
            result["cls_logits"] = outs["cls_logits"][0]
            result["reg_preds"] = outs["reg_preds"][0]
        return result


class SingleStageFSD(nn.Module):
    """LiDAR-only fully-sparse detector (segmentor + clustering + SIR + head)."""

    cfg: FSDConfig

    def setup(self):
        c = self.cfg
        self.segmentor = VoteSegmentor(cfg=c.segmentor, caps=c.caps)
        self.query_branch = FSDQueryBranch(cfg=c)

    def __call__(
        self,
        pb: PointBatch,
        batch_size: int,
        gt: Optional[GroundTruth] = None,
        train: bool = False,
        thresh_buffer=0.0,
        detection_weight=1.0,
    ):
        """``thresh_buffer``/``detection_weight`` are traced scalars driven
        by train.hooks.RuntimeSchedule: during segmentor pretrain the
        detection losses are weighted to 0 and foreground thresholds carry
        the decaying buffer (fsd_hooks.py:53-89 semantics)."""
        c = self.cfg
        seg_out = self.segmentor(pb, train, batch_size)
        result = self.query_branch(pb, seg_out, batch_size, train, thresh_buffer)
        result["seg_out"] = seg_out

        if gt is not None:
            losses = segmentor_loss(
                seg_out,
                *segmentor_targets(pb, gt, c.num_classes),
                c.segmentor,
            )
            det = multi_task_cluster_head_loss(
                result["cls_logits_tasks"], result["reg_preds_tasks"],
                result["cluster_xyz"], result["cluster_batch"],
                result["cluster_valid"], gt, c.head, c.task_tuple(),
                c.class_names,
            )
            for k in det:
                if k.startswith("loss"):
                    det[k] = det[k] * detection_weight
            losses.update(det)
            result["losses"] = losses
        return result

    def get_bboxes(self, result, batch_size: int):
        c = self.cfg
        if len(c.task_tuple()) == 1:
            return cluster_head_get_bboxes(
                result["cls_logits"], result["reg_preds"], result["cluster_xyz"],
                result["cluster_batch"], result["cluster_valid"], batch_size,
                c.head,
            )
        return multi_task_get_bboxes(
            result["cls_logits_tasks"], result["reg_preds_tasks"],
            result["cluster_xyz"], result["cluster_batch"],
            result["cluster_valid"], batch_size, c.head, c.task_tuple(),
            c.class_names,
        )
