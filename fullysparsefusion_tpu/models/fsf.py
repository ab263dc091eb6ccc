"""FSF — the full LiDAR+camera fusion detector.

Re-design of the reference FSF (models/detectors/FSF.py:31-1179):

  ① segmentor core → image-feature enhancement (per-point best-cam 2D class
    scores through a zero-init MLP added to the point features,
    segmentor_feat_inhance_*, FSF.py:730-804) → vote-seg head;
  ② camera-query branch: mask-grouped frustum pooling + 2D-pred encoding
    (frustum_forward, FSF.py:607-655);
  ③ LiDAR-query branch: the FSD clustering pipeline (fsd_forward, :569-605);
  ④ query fusion: concat camera+LiDAR queries, each projected to a common
    embedding (combine_frustum_and_fsd, :657-692);
  ⑤ cascade refinement: decode current boxes → RoI point pooling → RoI SIR →
    residual query update with position encoding → refined head
    (each_stage_refine, :1046-1083).

Points carry their pre-augmentation xyz in the last 3 channels
(SaveNoAugPoints, loading.py:342-354) — projection into the cameras always
uses un-augmented geometry.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import FSFConfig
from ..core.coders import BasePointBBoxCoder
from ..utils.containers import PointBatch, GroundTruth
from .layers import MLP
from .segmentor import (
    SegmentorCore, VoteSegHead, segmentor_targets, segmentor_loss,
)
from .camera import (
    CameraData, FrustumBranch, gather_point_instances, per_point_class_scores,
)
from .fsd import FSDQueryBranch
from .heads import SparseClusterHead, cluster_head_loss, cluster_head_get_bboxes
from .roi import extract_roi_points_grid, FullySparseBboxHead


class ZeroInitMLP(nn.Module):
    """MLP whose final (biased) layer is zero-initialized — the enhancement
    starts as identity (FSF.py:142-143)."""

    hidden_dims: tuple
    act: str = "gelu"

    @nn.compact
    def __call__(self, x, valid=None, train: bool = False):
        dims = tuple(self.hidden_dims)
        for c in dims[:-1]:
            x = nn.Dense(c, use_bias=False)(x)
            x = nn.LayerNorm(epsilon=1e-3)(x)
            x = nn.gelu(x)
        x = nn.Dense(
            dims[-1], use_bias=True,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(x)
        return x


class FSF(nn.Module):
    cfg: FSFConfig

    def setup(self):
        c = self.cfg
        f = c.fsd
        if f.tasks and len(f.tasks) > 1:
            raise ValueError(
                "FSF fuses single-task FSD queries (the shipped FSF configs run "
                "one task of all classes, FSF_nuScenes_config.py:18-20); "
                "multi-task heads are supported by SingleStageFSD"
            )
        self.seg_core = SegmentorCore(cfg=f.segmentor, caps=f.caps)
        seg_feat_dim = f.segmentor.unet_output_channels + 3
        self.seg_enhance_mlp = ZeroInitMLP(
            hidden_dims=(f.segmentor.head_hidden_dims[-1], seg_feat_dim)
        )
        self.seg_head = VoteSegHead(cfg=f.segmentor)
        self.frustum = FrustumBranch(
            sir_num_blocks=f.sir_num_blocks,
            sir_feat_channels=f.sir_feat_channels,
            sir_rel_mlp_hidden=f.sir_rel_mlp_hidden,
            sir_xyz_normalizer=f.sir_xyz_normalizer,
            encode_2d_dims=c.encode_2d_dims,
            num_classes=f.num_classes,
            overlap_k=c.overlap_k,
            frustum_points=f.caps.frustum_points,
            frustum_objects=f.caps.frustum_objects,
        )
        self.frustum_head = SparseClusterHead(
            cfg=c.frustum_head, tasks=(f.class_names,), class_names=f.class_names
        )
        self.fsd_branch = FSDQueryBranch(cfg=f)
        self.combine_frustum_mlp = MLP((c.embed_dims,), norm="ln", act="gelu")
        self.combine_fsd_mlp = MLP((c.embed_dims,), norm="ln", act="gelu")

        self.refine_sirs = [
            FullySparseBboxHead(
                feat_channels=f.sir_feat_channels,
                rel_mlp_hidden=f.sir_rel_mlp_hidden,
                xyz_normalizer=f.sir_xyz_normalizer,
                name=f"refine_sir_{i}",
            )
            for i in range(c.num_refine_stages)
        ]
        self.refine_img_mlps = [
            MLP(c.refine_img_mlp_dims, norm="ln", act="gelu", name=f"refine_img_mlp_{i}")
            for i in range(c.num_refine_stages)
        ]
        self.lidar_img_mlps = [
            MLP((c.embed_dims, c.embed_dims), norm="ln", act="gelu",
                name=f"lidar_img_mlp_{i}")
            for i in range(c.num_refine_stages)
        ]
        self.position_encoders = [
            MLP((c.embed_dims, c.embed_dims), norm="ln", act="gelu",
                name=f"position_encoder_{i}")
            for i in range(c.num_refine_stages)
        ]
        self.out_projs = [
            MLP((c.embed_dims, c.embed_dims), norm="ln", act="gelu", is_head=True,
                name=f"out_proj_{i}")
            for i in range(c.num_refine_stages)
        ]
        self.refined_heads = [
            SparseClusterHead(
                cfg=c.refined_head, tasks=(f.class_names,),
                class_names=f.class_names, name=f"refined_head_{i}",
            )
            for i in range(c.num_refine_stages)
        ]
        self.coder = BasePointBBoxCoder(c.fsd.head.code_size)

    def __call__(
        self,
        pb: PointBatch,
        cam: CameraData,
        batch_size: int,
        gt: Optional[GroundTruth] = None,
        no_aug_gt: Optional[GroundTruth] = None,
        train: bool = False,
        thresh_buffer=0.0,
        detection_weight=1.0,
        run_until: Optional[str] = None,
    ) -> Dict:
        """``run_until`` (static) early-returns after a phase — 'seg',
        'frustum', 'fsd', 'fusion' — for stage-level profiling."""
        c = self.cfg
        f = c.fsd
        # last 3 channels = no-aug xyz (split_points_last_3dim, FSF.py:554-560)
        points = pb.points[:, :-3]
        noaug_xyz = pb.points[:, -3:]
        pb_inner = PointBatch(points=points, batch_idx=pb.batch_idx, valid=pb.valid)

        # ① segmentation with image enhancement
        seg_feats, pt_valid = self.seg_core(pb_inner, train, batch_size)
        if run_until == "core":   # profiling probe: segmentor core only
            return dict(seg_feats=seg_feats, pt_valid=pt_valid)
        obj_ids, obj_scores = gather_point_instances(
            noaug_xyz, pb.batch_idx, pt_valid, cam
        )
        cls_scores_2d = per_point_class_scores(obj_ids, obj_scores)
        seg_feats = seg_feats + self.seg_enhance_mlp(cls_scores_2d, pt_valid, train)
        seg_feats = seg_feats * pt_valid[:, None].astype(seg_feats.dtype)
        seg_out = self.seg_head(seg_feats, pt_valid, train)
        if run_until == "seg":
            return dict(seg_out=seg_out)

        # ② camera queries
        fr = self.frustum(
            points, seg_feats, seg_out["seg_logits"], obj_ids,
            pb.batch_idx, cam, train,
        )
        fr_out = self.frustum_head(fr["obj_feat"], fr["obj_valid"], train)
        if run_until == "frustum":
            return dict(seg_out=seg_out, frustum=fr_out)

        # ③ LiDAR queries
        fsd = self.fsd_branch(pb_inner, seg_out, batch_size, train, thresh_buffer)
        if run_until == "fsd":
            return dict(seg_out=seg_out, frustum=fr_out, fsd=fsd)

        # ④ fusion
        centers = jnp.concatenate([fr["obj_centers"], fsd["cluster_xyz"]])
        q_batch = jnp.concatenate([fr["obj_batch"], fsd["cluster_batch"]])
        q_valid = jnp.concatenate([fr["obj_valid"], fsd["cluster_valid"]])
        cls_logits = jnp.concatenate([fr_out["cls_logits"][0], fsd["cls_logits"]])
        reg_preds = jnp.concatenate([fr_out["reg_preds"][0], fsd["reg_preds"]])
        res_query = jnp.concatenate(
            [
                self.combine_frustum_mlp(fr["obj_feat"], q_valid[: fr["obj_feat"].shape[0]], train),
                self.combine_fsd_mlp(fsd["obj_feat"], fsd["cluster_valid"], train),
            ]
        )

        result = dict(
            seg_out=seg_out,
            frustum=dict(out=fr_out, **{k: v for k, v in fr.items() if k != "obj_feat"}),
            fsd=fsd,
            stages=[],
        )
        if run_until == "fusion":
            return result

        # ⑤ cascade refinement
        stage_outputs = []
        for i in range(c.num_refine_stages):
            boxes = self.coder.decode(reg_preds, centers)
            boxes = jax.lax.stop_gradient(boxes)
            new_centers = boxes[:, :3]
            pcr = f.segmentor.point_cloud_range
            rp = extract_roi_points_grid(
                points[:, :3], pb.batch_idx, pt_valid,
                boxes[:, :7], q_batch, q_valid,
                c.extra_wlh, f.caps.roi_points, c.rois_per_point,
                batch_size=batch_size,
                bev_lo=(pcr[0], pcr[1]), bev_hi=(pcr[3], pcr[4]),
            )
            sel_pts = points[rp.point_idx]
            sel_feats = seg_feats[rp.point_idx]
            sel_img = self.refine_img_mlps[i](
                cls_scores_2d[rp.point_idx], rp.valid, train
            )
            feats_in = jnp.concatenate([sel_feats, sel_img], axis=1)
            roi_feats, nonempty = self.refine_sirs[i](
                sel_pts, feats_in, rp.geometry, rp.roi_idx, rp.valid,
                centers.shape[0], train,
            )
            cur = self.lidar_img_mlps[i](roi_feats, q_valid, train)
            pos = self.position_encoders[i](
                jax.lax.stop_gradient(new_centers), q_valid, train
            )
            query = self.out_projs[i](cur + res_query + pos, q_valid, train)
            head_out = self.refined_heads[i](query, q_valid, train)
            centers = new_centers
            cls_logits = head_out["cls_logits"][0]
            reg_preds = head_out["reg_preds"][0]
            res_query = query
            stage_outputs.append(
                dict(centers=centers, cls_logits=cls_logits, reg_preds=reg_preds)
            )

        result["stages"] = stage_outputs
        result["final"] = dict(
            centers=centers, cls_logits=cls_logits, reg_preds=reg_preds,
            q_batch=q_batch, q_valid=q_valid,
        )

        if gt is not None:
            losses = self._losses(pb_inner, cam, gt, no_aug_gt, result, fr, fsd, fr_out)
            for k in list(losses):
                if k.startswith(("frustum_loss", "fsd_loss", "stage")) and "loss" in k:
                    losses[k] = losses[k] * detection_weight
            result["losses"] = losses
        return result

    def _losses(self, pb_inner, cam, gt, no_aug_gt, result, fr, fsd, fr_out):
        from ..core.assigners import hybrid_assign

        c = self.cfg
        f = c.fsd
        if no_aug_gt is None:
            no_aug_gt = gt
        img_h, img_w = cam.img_h, cam.img_w
        seg_out = result["seg_out"]
        losses = segmentor_loss(
            seg_out, *segmentor_targets(pb_inner, gt, f.num_classes), f.segmentor
        )
        # camera-query head: HybridAssigner (3D point-in-box ∪ 2D MaxIoU on
        # projected no-aug GT; FSF_nuScenes_config.py:221-237)
        fr_assign = hybrid_assign(
            fr["obj_centers"], fr["obj_batch"], fr["obj_valid"],
            fr["preds_2d"], gt, no_aug_gt, cam.lidar2img, img_w, img_h,
        )
        fr_losses = cluster_head_loss(
            fr_out["cls_logits"][0], fr_out["reg_preds"][0], fr["obj_centers"],
            fr["obj_batch"], fr["obj_valid"], gt, c.frustum_head,
            assign=fr_assign, prefix="frustum_",
        )
        losses.update(fr_losses)
        fsd_losses = cluster_head_loss(
            fsd["cls_logits"], fsd["reg_preds"], fsd["cluster_xyz"],
            fsd["cluster_batch"], fsd["cluster_valid"], gt, f.head, prefix="fsd_",
        )
        losses.update(fsd_losses)
        fin = result["final"]
        preds_2d_all = jnp.concatenate(
            [
                fr["preds_2d"],
                jnp.zeros((f.caps.clusters, fr["preds_2d"].shape[1])),
            ]
        )
        for i, st in enumerate(result["stages"]):
            # FrustumAssigner + DistAssigner (FSF_nuScenes_config.py:328-363)
            st_assign = hybrid_assign(
                st["centers"], fin["q_batch"], fin["q_valid"],
                preds_2d_all, gt, no_aug_gt, cam.lidar2img, img_w, img_h,
                query_logits=st["cls_logits"],
                max_dist_per_class=c.refine_max_dist,
                restrict_3d_to_noaug=False,
            )
            st_losses = cluster_head_loss(
                st["cls_logits"], st["reg_preds"], st["centers"],
                fin["q_batch"], fin["q_valid"], gt, c.refined_head,
                assign=st_assign, prefix=f"stage{i}_",
            )
            losses.update(st_losses)
        return losses

    def get_bboxes(self, result, batch_size: int):
        fin = result["final"]
        return cluster_head_get_bboxes(
            fin["cls_logits"], fin["reg_preds"], fin["centers"],
            fin["q_batch"], fin["q_valid"], batch_size, self.cfg.refined_head,
        )
