"""Camera-query (frustum) branch.

Re-design of the reference's frustum pipeline (FSF.py:228-474,607-655):
2D instance masks (pre-computed offline by HTC) group LiDAR points into
per-instance frustums; each instance becomes a "camera query" pooled by a
dedicated SIR.

Static-shape reformulation:
  * mask lookup gives per-point instance ids [N, cams, cls]
    (ops.projection.points_in_mask);
  * the reference's dynamic multi-mask point duplication
    (double_overlap_pts, FSF.py:260-297) becomes a top-K expansion — each
    point spawns K copies carrying its K largest instance ids, invalid
    copies masked (K = overlap capacity, cams-overlap is physically ≤ 2-3);
  * copies are compacted to a fixed foreground capacity and grouped by
    (batch, instance-id) keys;
  * cluster centers are foreground-probability-weighted means
    (get_cluster_delta_weighted, FSF.py:313-329).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..ops.segment import SegmentInfo, unique_segments, segment_sum
from ..ops.projection import points_in_mask_compact
from ..utils.gather import masked_gather
from .layers import MLP
from .sir import SIR


@struct.dataclass
class CameraData:
    """Pre-computed 2D instance data (reference LoadMaskFromFiles output).

    masks: [B·cams·H·W, cls] uint16 PACKED, CHANNEL-LAST, FLAT — value =
           id | score_u8 << 8 with id = anno row + 1, 0 = bg
           (data/masks.py pack_mask_scores). Class planes are contiguous
           per pixel so the per-point lookup row-gathers all classes at
           once, and the instance score rides the same gather
           (ops/projection.py). Stored pre-flattened (build from the
           [B, cams, H, W, cls] planes via :meth:`build`): an in-jit
           ``reshape(-1, cls)`` of the 5-D texture repacked 86 MB of tiled
           layout EVERY call — measured ~6 ms at batch 2
           (tools/microbench_mask_gather.py layout probe) — while a
           leading-dims-only reshape of the flat form is free.
    anno:  [B, A, 9] — [x1,y1,x2,y2, score, category, cam_id, obj_id, valid]
           sorted by obj_id (loading.py:301-339 reorg_anno_multi_cls).
    lidar2img: [B, cams, 4, 4].
    img_h/img_w: static mask plane dims (the array no longer carries them).
    """

    masks: jax.Array
    anno: jax.Array
    lidar2img: jax.Array
    img_h: int = struct.field(pytree_node=False, default=0)
    img_w: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def build(cls, masks_planes, anno, lidar2img) -> "CameraData":
        """From [B, cams, H, W, num_cls] packed planes (host-side)."""
        b, cams, h, w, ncls = masks_planes.shape
        return cls(
            masks=jnp.asarray(masks_planes).reshape(-1, ncls),
            anno=jnp.asarray(anno),
            lidar2img=jnp.asarray(lidar2img),
            img_h=int(h), img_w=int(w),
        )

    @property
    def num_cams(self) -> int:
        return self.lidar2img.shape[1]

    @property
    def num_cls(self) -> int:
        return self.masks.shape[-1]

    @property
    def max_anno(self) -> int:
        return self.anno.shape[1]


class FrustumSelection(NamedTuple):
    """Compacted frustum foreground point copies."""

    point_idx: jax.Array   # [F] row into the original point set
    obj_id: jax.Array      # [F] instance id (≥1 where valid)
    batch_idx: jax.Array   # [F]
    valid: jax.Array       # [F]


def gather_point_instances(
    xyz_noaug: jax.Array, batch_idx: jax.Array, valid: jax.Array, cam: CameraData
) -> Tuple[jax.Array, jax.Array]:
    """([N, K, cls] instance ids, [N, K, cls] 2D scores); both 0 outside
    masks / for invalid points. K = 2 compacted camera slots (lowest-index
    valid cams) — exact for surround rigs whose camera overlap is pairwise
    (ops.projection.points_in_mask_compact; every downstream consumer is
    camera-axis agnostic)."""
    ids, scores = points_in_mask_compact(
        xyz_noaug, batch_idx, cam.lidar2img, cam.masks, cam.img_h, cam.img_w)
    keep = valid[:, None, None]
    return ids * keep, scores * keep


def select_frustum_points(
    obj_ids: jax.Array,   # [N, cams, cls]
    batch_idx: jax.Array,
    overlap_k: int,
    capacity: int,
) -> FrustumSelection:
    """Top-K overlap expansion + compaction (replaces double_overlap_pts)."""
    n = obj_ids.shape[0]
    flat = obj_ids.reshape(n, -1)
    topk, _ = jax.lax.top_k(flat, overlap_k)     # [N, K] ids desc
    copy_valid = (topk > 0).reshape(-1)          # [N*K]
    sel, sel_valid = masked_gather(copy_valid, capacity)
    point_idx = sel // overlap_k
    obj_id = topk.reshape(-1)[sel]
    return FrustumSelection(
        point_idx=point_idx.astype(jnp.int32),
        obj_id=jnp.where(sel_valid, obj_id, 0),
        batch_idx=batch_idx[point_idx],
        valid=sel_valid,
    )


def frustum_segments(
    sel: FrustumSelection, max_anno: int, capacity: int
) -> Tuple[SegmentInfo, jax.Array, jax.Array]:
    """Group copies by (batch, instance) → (seg, obj_batch, obj_anno_row)."""
    key = sel.batch_idx * (max_anno + 1) + sel.obj_id
    seg = unique_segments(key, sel.valid, capacity)
    safe = jnp.where(seg.seg_valid, seg.unique_keys, 0)
    obj_batch = safe // (max_anno + 1)
    obj_row = safe % (max_anno + 1) - 1  # anno row (-1 for unused slots)
    return seg, obj_batch.astype(jnp.int32), obj_row.astype(jnp.int32)


def weighted_cluster_centers(
    xyz: jax.Array, w: jax.Array, seg: SegmentInfo
) -> jax.Array:
    """fg-probability-weighted per-instance centers (FSF.py:313-329)."""
    w = jnp.clip(jax.lax.stop_gradient(w), 1e-5, None)[:, None]
    sw = segment_sum(jnp.concatenate([xyz * w, w], axis=1), seg.seg_id, seg.capacity)
    return sw[:, :3] / jnp.maximum(sw[:, 3:4], 1e-6)


def encode_preds_2d(
    preds_2d: jax.Array, img_w: int, img_h: int, num_classes: int
) -> jax.Array:
    """[K, 9] anno rows → [K, 4+1+(C+1)] features (FSF.py:449-474)."""
    bbox = preds_2d[:, :4] / jnp.asarray([img_w, img_h, img_w, img_h], preds_2d.dtype)
    score = preds_2d[:, 4:5]
    category = preds_2d[:, 5].astype(jnp.int32).clip(0, num_classes)
    onehot = jax.nn.one_hot(category, num_classes + 1, dtype=preds_2d.dtype)
    return jnp.concatenate([bbox, score, onehot], axis=1)


def object_preds_2d(
    cam: CameraData, obj_batch: jax.Array, obj_row: jax.Array, num_classes: int
) -> jax.Array:
    """Per-object anno rows; rows without an instance get category=bg
    (get_single_cls_preds_2d, FSF.py:476-504)."""
    b, a, d = cam.anno.shape
    flat = cam.anno.reshape(b * a, d)
    ok = obj_row >= 0
    idx = obj_batch * a + obj_row.clip(0)
    rows = flat[idx.clip(0, b * a - 1)]
    rows = jnp.where(ok[:, None], rows, 0.0)
    rows = rows.at[:, 5].set(jnp.where(ok, rows[:, 5], float(num_classes)))
    return rows


def per_point_class_scores(
    obj_ids: jax.Array,     # [N, cams, cls]
    obj_scores: jax.Array,  # [N, cams, cls] texture-packed 2D scores
) -> jax.Array:
    """Best-cam per-class 2D scores per point (img_cross_attn, FSF.py:694-728).

    Picks the camera with the most mask hits for each point, then reads that
    camera's per-class instance scores → [N, cls]. Scores come packed in
    the mask texture (pack_mask_scores), so no anno-table gather happens
    here — the per-(point, class) scalar gather from the tiny anno table
    was the most expensive op in the whole model (10.2 ms on v5e).
    """
    n, num_cams, num_cls = obj_ids.shape
    hits = (obj_ids > 0).sum(-1)                  # [N, cams]
    best_cam = jnp.argmax(hits, axis=1)           # [N]
    # one-hot select over the 6 cams — not take_along_axis (dynamic
    # minor-dim indexing is ~10× slower on TPU; docs/performance.md)
    oh = jnp.arange(num_cams) == best_cam[:, None]
    per_cls = jnp.einsum("nc,nck->nk", oh.astype(obj_ids.dtype), obj_ids)
    scores = jnp.einsum("nc,nck->nk", oh.astype(obj_scores.dtype), obj_scores)
    return jnp.where(per_cls > 0, scores, 0.0)


class FrustumBranch(nn.Module):
    """Frustum SIR + 2D-pred encoder → camera-query features."""

    sir_num_blocks: int = 3
    sir_feat_channels: Tuple[Tuple[int, ...], ...] = ((128, 128),) * 3
    sir_rel_mlp_hidden: Tuple[Tuple[int, ...], ...] = ((16, 32),) * 3
    sir_xyz_normalizer: Tuple[float, float, float] = (20.0, 20.0, 4.0)
    encode_2d_dims: Tuple[int, ...] = (128, 128)
    num_classes: int = 10
    overlap_k: int = 3
    frustum_points: int = 8192
    frustum_objects: int = 256

    @nn.compact
    def __call__(
        self,
        points: jax.Array,       # [N, D] point channels
        seg_feats: jax.Array,    # [N, Cf]
        seg_logits: jax.Array,   # [N, C+1] for fg weights
        obj_ids: jax.Array,      # [N, cams, cls]
        batch_idx: jax.Array,
        cam: CameraData,
        train: bool = False,
        cluster_center: Optional[jax.Array] = None,
    ):
        sel = select_frustum_points(
            obj_ids, batch_idx, self.overlap_k, self.frustum_points
        )
        seg, obj_batch, obj_row = frustum_segments(
            sel, cam.max_anno, self.frustum_objects
        )
        f_valid = sel.valid & (seg.seg_id < self.frustum_objects)

        pts = points[sel.point_idx]
        feats = seg_feats[sel.point_idx]
        fg_w = 1.0 - jax.nn.softmax(seg_logits, axis=1)[:, -1]
        w = fg_w[sel.point_idx] * f_valid

        if cluster_center is None:
            centers = weighted_cluster_centers(pts[:, :3], w, seg)
        else:
            centers = cluster_center
        sid = seg.seg_id.clip(0, self.frustum_objects - 1)
        f_cluster = pts[:, :3] - centers[sid]

        _, cluster_feats = SIR(
            num_blocks=self.sir_num_blocks,
            feat_channels=self.sir_feat_channels,
            rel_mlp_hidden_dims=self.sir_rel_mlp_hidden,
            xyz_normalizer=self.sir_xyz_normalizer,
        )(pts, feats, f_cluster, seg, f_valid, train)

        preds_2d = object_preds_2d(cam, obj_batch, obj_row, self.num_classes)
        img_h, img_w = cam.img_h, cam.img_w
        enc = encode_preds_2d(preds_2d, img_w, img_h, self.num_classes)
        img_feat = MLP(tuple(self.encode_2d_dims), norm="ln", act="gelu")(
            enc, seg.seg_valid, train
        )
        obj_feat = jnp.concatenate([cluster_feats, img_feat], axis=1)
        return dict(
            obj_feat=obj_feat,
            obj_centers=centers,
            obj_batch=obj_batch,
            obj_valid=seg.seg_valid,
            obj_row=obj_row,
            preds_2d=preds_2d,
        )
