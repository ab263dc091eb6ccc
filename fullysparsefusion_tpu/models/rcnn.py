"""Two-stage RCNN refinement head — the FSD second stage.

Covers the reference's GroupCorrectionHead + FullySparseBboxHead_OpenSource
surface (roi_heads/fsd_roi_head.py:12-289, fsd_bbox_head_fsd.py:19-794):
first-stage proposals are assigned to GT by 3D IoU, their member points are
pooled (canonical-frame geometry), a SIR stack produces per-RoI features,
and class + box-residual branches refine each proposal. Not reachable from
the shipped FSF configs (FSF inlines refinement in the detector) but part of
the framework's model-family surface.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Capacities, HeadConfig
from ..core.coders import BasePointBBoxCoder
from ..core import losses as L
from ..ops.geometry import boxes_iou_3d
from ..ops.nms import multiclass_nms_bev_batched, NMSResult
from ..utils.containers import GroundTruth
from .layers import MLP, mesh_mean
from .roi import extract_roi_points, FullySparseBboxHead


def assign_rois_by_iou(
    rois: jax.Array,        # [Q, 7+]
    roi_batch: jax.Array,
    roi_valid: jax.Array,
    gt: GroundTruth,
    pos_iou_thr: float = 0.55,
) -> Tuple[jax.Array, jax.Array]:
    """Best-3D-IoU GT per proposal (RCNN-style). Returns (flat gt idx | -1,
    best iou)."""
    b, m, _ = gt.boxes.shape
    flat = gt.boxes.reshape(b * m, -1)
    labels = gt.labels.reshape(b * m)
    gvalid = gt.valid.reshape(b * m) & (labels >= 0)
    gbatch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), m)
    iou = boxes_iou_3d(rois[:, :7], flat[:, :7])
    mask = (
        roi_valid[:, None] & gvalid[None, :]
        & (roi_batch[:, None] == gbatch[None, :])
    )
    iou = jnp.where(mask, iou, -1.0)
    best = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    assigned = jnp.where(best_iou >= pos_iou_thr, best, -1)
    return assigned, best_iou


class GroupCorrectionHead(nn.Module):
    """RoI pooling + SIR + per-RoI cls/reg refinement."""

    cfg: HeadConfig
    caps: Capacities
    extra_wlh: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    reg_mlp: Sequence[int] = (512, 512)
    cls_mlp: Sequence[int] = (512, 512)
    sir_feat_channels: Sequence[Sequence[int]] = ((128, 128),) * 3
    sir_rel_mlp_hidden: Sequence[Sequence[int]] = ((16, 32),) * 3

    @nn.compact
    def __call__(
        self,
        points: jax.Array,       # [N, D] point channels
        point_feats: jax.Array,  # [N, C]
        point_batch: jax.Array,
        point_valid: jax.Array,
        rois: jax.Array,         # [Q, 7+] proposals
        roi_batch: jax.Array,
        roi_valid: jax.Array,
        train: bool = False,
    ) -> Dict[str, jax.Array]:
        c = self.cfg
        rp = extract_roi_points(
            points[:, :3], point_batch, point_valid,
            rois[:, :7], roi_batch, roi_valid,
            self.extra_wlh, self.caps.roi_points,
        )
        feats_in = point_feats[rp.point_idx]
        roi_feats, nonempty = FullySparseBboxHead(
            num_blocks=len(self.sir_feat_channels),
            feat_channels=self.sir_feat_channels,
            rel_mlp_hidden=self.sir_rel_mlp_hidden,
        )(points[rp.point_idx], feats_in, rp.geometry, rp.roi_idx, rp.valid,
          rois.shape[0], train)

        cls_logits = MLP(
            tuple(self.cls_mlp) + (c.num_classes,), norm=c.norm, act=c.act,
            is_head=True,
        )(roi_feats, roi_valid, train)
        reg_preds = MLP(
            tuple(self.reg_mlp) + (c.code_size,), norm=c.norm, act=c.act,
            is_head=True,
        )(roi_feats, roi_valid, train)
        return dict(
            cls_logits=cls_logits, reg_preds=reg_preds,
            nonempty=nonempty & roi_valid,
        )


def rcnn_loss(
    outs: Dict[str, jax.Array],
    rois: jax.Array,
    roi_batch: jax.Array,
    roi_valid: jax.Array,
    gt: GroundTruth,
    cfg: HeadConfig,
    pos_iou_thr: float = 0.55,
    prefix: str = "rcnn_",
) -> Dict[str, jax.Array]:
    """Targets encoded against the proposal centers (canonical residuals)."""
    coder = BasePointBBoxCoder(cfg.code_size)
    b, m, _ = gt.boxes.shape
    flat = gt.boxes.reshape(b * m, -1)
    labels = gt.labels.reshape(b * m)
    assigned, best_iou = assign_rois_by_iou(
        rois, roi_batch, roi_valid, gt, pos_iou_thr
    )
    pos = assigned >= 0
    safe = assigned.clip(0)
    cls_target = jnp.where(pos, labels[safe], cfg.num_classes)
    onehot = jax.nn.one_hot(cls_target, cfg.num_classes)
    focal = L.sigmoid_focal_loss(
        outs["cls_logits"], onehot, cfg.focal_gamma, cfg.focal_alpha
    )
    w = roi_valid.astype(jnp.float32)
    # avg factors pmean'd over the mesh axis under DP (see layers.mesh_mean)
    cls_avg = mesh_mean(w.sum())
    loss_cls = cfg.loss_cls_weight * jnp.sum(focal * w[:, None]) / jnp.maximum(cls_avg, 1.0)

    targets = coder.encode(flat[safe], rois[:, :3])
    pw = pos.astype(jnp.float32)
    num_pos = mesh_mean(pw.sum())
    diff = jnp.abs(outs["reg_preds"] - targets) * pw[:, None]
    loss_reg = jnp.sum(diff[:, : min(8, cfg.code_size)]) / jnp.maximum(num_pos, 1.0)
    return {
        prefix + "loss_cls": loss_cls,
        prefix + "loss_reg": loss_reg,
        prefix + "num_pos": num_pos,
    }


def rcnn_get_bboxes(
    outs: Dict[str, jax.Array],
    rois: jax.Array,
    roi_batch: jax.Array,
    batch_size: int,
    cfg: HeadConfig,
) -> NMSResult:
    coder = BasePointBBoxCoder(cfg.code_size)
    boxes = coder.decode(outs["reg_preds"], rois[:, :3])
    scores = jax.nn.sigmoid(outs["cls_logits"])
    valid = outs["nonempty"]
    return multiclass_nms_bev_batched(
        boxes, scores, valid, roi_batch, batch_size,
        cfg.nms_thr, cfg.score_thr, cfg.max_num,
    )
