"""Two-stage FSD detector: SingleStageFSD proposals + GroupCorrectionHead.

The reference exposes FSD as a two-stage detector when configured with a
``roi_head`` (roi_heads/fsd_roi_head.py:12-289 over the
FullySparseBboxHead_OpenSource bbox head, fsd_bbox_head_fsd.py:19-794):
the first stage's cluster predictions become RoIs whose member points are
re-pooled and refined. This wrapper composes the existing pieces into that
detector surface (as_rpn semantics of SparseClusterHead + the RCNN loss /
decode from models/rcnn.py).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import FSDConfig, HeadConfig
from ..core.coders import BasePointBBoxCoder
from ..utils.containers import PointBatch, GroundTruth
from .fsd import SingleStageFSD
from .rcnn import GroupCorrectionHead, rcnn_loss, rcnn_get_bboxes


class TwoStageFSD(nn.Module):
    """First stage = SingleStageFSD (as_rpn), second = GroupCorrectionHead."""

    cfg: FSDConfig
    rcnn_cfg: Optional[HeadConfig] = None

    def setup(self):
        c = self.cfg
        self.rpn = SingleStageFSD(cfg=c)
        rc = self.rcnn_cfg or c.head
        self.roi_head = GroupCorrectionHead(cfg=rc, caps=c.caps)
        self._rc = rc
        self.coder = BasePointBBoxCoder(c.head.code_size)

    def __call__(
        self,
        pb: PointBatch,
        batch_size: int,
        gt: Optional[GroundTruth] = None,
        train: bool = False,
        thresh_buffer=0.0,
        detection_weight=1.0,
    ) -> Dict:
        c = self.cfg
        out1 = self.rpn(pb, batch_size, gt, train, thresh_buffer, detection_weight)

        # first-stage decoded boxes are the proposals (fsd_roi_head.py:73-99:
        # rpn results feed _bbox_forward_train); stop-gradient like the
        # reference's detached proposal boxes
        rois = jax.lax.stop_gradient(
            self.coder.decode(out1["reg_preds"], out1["cluster_xyz"])
        )
        roi_batch = out1["cluster_batch"]
        roi_valid = out1["cluster_valid"]

        # member points carry their raw channels; per-point features are the
        # segmentor's point features (seg_feats through the vote head input)
        seg_feats = out1["seg_out"]["seg_feats"]
        pt_valid = out1["seg_out"]["valid"]
        outs2 = self.roi_head(
            pb.points, seg_feats, pb.batch_idx, pt_valid,
            rois, roi_batch, roi_valid, train,
        )
        result = dict(out1, rcnn=outs2, rois=rois,
                      roi_batch=roi_batch, roi_valid=roi_valid)
        if gt is not None:
            losses = dict(out1["losses"])
            det = rcnn_loss(outs2, rois, roi_batch, roi_valid, gt, self._rc)
            for k in list(det):
                if "loss" in k:
                    det[k] = det[k] * detection_weight
            losses.update(det)
            result["losses"] = losses
        return result

    def get_bboxes(self, result, batch_size: int):
        return rcnn_get_bboxes(
            result["rcnn"], result["rois"], result["roi_batch"],
            batch_size, self._rc,
        )
