"""VoteSegmentor: point-wise semantic segmentation + center voting.

Re-design of the reference VoteSegmentor (single_stage_fsd.py:155-378) +
VoteSegHead (segmentation_head.py:15-266): dynamic voxelization → VFE →
sparse UNet → voxel-to-point scatter neck (gathered voxel features + local
offset from voxel center, voxel2point_neck.py:42-67) → per-point MLP head
emitting (C+1)-way logits and per-class 3-vector center votes. Votes are
sqrt-encoded (segmentation_head.py:262-266).

Split into ``SegmentorCore`` (features) and ``VoteSegHead`` (logits/votes)
so FSF can inject image features between them
(segmentor_feat_inhance_*, FSF.py:730-804).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import VoteSegmentorConfig, Capacities
from ..ops.voxelize import voxelize_points, grid_dims
from ..ops.sparse_conv import SparseTensor
from ..ops.geometry import gravity_center, points_box_assignment_batched
from ..core import losses as L
from ..utils.containers import PointBatch, GroundTruth
from .layers import MLP
from .vfe import DynamicScatterVFE
from .sparse_unet import SparseUNet


def encode_vote_targets(delta: jax.Array) -> jax.Array:
    return jnp.sign(delta) * jnp.sqrt(jnp.abs(delta))


def decode_vote_targets(preds: jax.Array) -> jax.Array:
    return preds * jnp.abs(preds)


class SegmentorCore(nn.Module):
    """voxelize → VFE → sparse UNet → voxel2point neck → per-point features."""

    cfg: VoteSegmentorConfig
    caps: Capacities

    @nn.compact
    def __call__(self, pb: PointBatch, train: bool = False, batch_size: int = 0):
        c = self.cfg
        xyz = pb.xyz
        seg, _, vox_batch, vox_coords = voxelize_points(
            xyz, pb.batch_idx, pb.valid, c.voxel_size, c.point_cloud_range,
            self.caps.voxels, batch_size=batch_size,
        )
        pt_valid = pb.valid & (seg.seg_id < self.caps.voxels)

        voxel_feats = DynamicScatterVFE(
            feat_channels=tuple(c.vfe_channels),
            voxel_size=c.voxel_size,
            pc_range_min=tuple(c.point_cloud_range[:3]),
        )(pb.points, seg, vox_coords, pt_valid, train)

        dims = grid_dims(c.voxel_size, c.point_cloud_range)
        st = SparseTensor(
            feats=voxel_feats, coords=vox_coords, batch=vox_batch,
            valid=seg.seg_valid, dims=dims, batch_size=batch_size,
        )
        unet_out = SparseUNet(
            base_channels=c.unet_base_channels,
            output_channels=c.unet_output_channels,
            encoder_channels=c.unet_encoder_channels,
            encoder_strided_paddings=c.unet_strided_paddings,
            decoder_channels=c.unet_decoder_channels,
            stage_capacity_divisors=c.unet_capacity_divisors,
            stage_capacities=c.unet_stage_capacities,
            dense_min_occupancy=c.unet_dense_min_occupancy,
            window_conv=(
                tuple(c.unet_window_conv)
                if c.unet_window_conv and c.unet_window_conv[0] > 0 else None),
            window_conv_train=c.unet_window_conv_train,
        )(st, train)  # [voxels, out_ch]

        # voxel2point neck: gather voxel feature + local offset from voxel center
        sid = seg.seg_id.clip(0, self.caps.voxels - 1)
        pt_vox_feat = unet_out[sid]
        vs = jnp.asarray(c.voxel_size, xyz.dtype)
        lo = jnp.asarray(c.point_cloud_range[:3], xyz.dtype)
        centers = vox_coords.astype(xyz.dtype) * vs + vs * 0.5 + lo
        local_off = xyz - centers[sid]
        seg_feats = jnp.concatenate([pt_vox_feat, local_off], axis=1)
        return seg_feats * pt_valid[:, None].astype(seg_feats.dtype), pt_valid

    @property
    def feat_dim(self) -> int:
        return self.cfg.unet_output_channels + 3


class VoteSegHead(nn.Module):
    """Per-point MLP head → (C+1)-way logits + per-class center votes."""

    cfg: VoteSegmentorConfig

    @nn.compact
    def __call__(self, seg_feats, valid, train: bool = False):
        c = self.cfg
        hidden = MLP(tuple(c.head_hidden_dims), norm="bn", act="relu")(
            seg_feats, valid, train
        )
        n_out = c.num_classes + 1
        seg_logits = nn.Dense(n_out, use_bias=True)(hidden)
        vote_preds = nn.Dense(n_out * 3, use_bias=True)(hidden)
        # decode is elementwise (p·|p|) — apply on the 2-D layout directly,
        # no [P, C+1, 3] reshape round-trip (tiny minor dims tile-pad)
        offsets = decode_vote_targets(vote_preds)
        return dict(
            seg_feats=seg_feats,
            seg_logits=seg_logits,
            vote_preds=vote_preds,
            offsets=offsets,
            valid=valid,
        )


class VoteSegmentor(nn.Module):
    """Core + head (the standalone configuration used by SingleStageFSD)."""

    cfg: VoteSegmentorConfig
    caps: Capacities

    @nn.compact
    def __call__(
        self, pb: PointBatch, train: bool = False, batch_size: int = 0
    ) -> Dict[str, jax.Array]:
        seg_feats, pt_valid = SegmentorCore(cfg=self.cfg, caps=self.caps)(
            pb, train, batch_size
        )
        return VoteSegHead(cfg=self.cfg)(seg_feats, pt_valid, train)


def segmentor_targets(pb: PointBatch, gt: GroundTruth, num_classes: int):
    """Per-point (label, vote_target, vote_mask) from GT boxes.

    Matches segmentation_head.get_targets (:199-237): label = box's class or
    bg (= num_classes); vote target = sqrt-encoded offset to the containing
    box's gravity center; mask = in-box.
    """
    b, m, _ = gt.boxes.shape
    flat_boxes = gt.boxes.reshape(b * m, -1)
    flat_labels = gt.labels.reshape(b * m)
    flat_valid = gt.valid.reshape(b * m) & (flat_labels >= 0)
    # restrict membership to the point's own batch element
    box_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), m)
    assign = points_box_assignment_batched(
        pb.xyz, pb.batch_idx, flat_boxes[:, :7], box_batch, flat_valid
    )
    in_box = assign >= 0
    labels = jnp.where(in_box, flat_labels[assign.clip(0)], num_classes)
    labels = jnp.where(pb.valid, labels, num_classes).astype(jnp.int32)
    centers = gravity_center(flat_boxes[:, :7])
    delta = jnp.where(in_box[:, None], centers[assign.clip(0)] - pb.xyz, 0.0)
    vote_targets = encode_vote_targets(delta)
    vote_mask = in_box & pb.valid
    return labels, vote_targets, vote_mask


def segmentor_loss(
    out: Dict[str, jax.Array],
    labels: jax.Array,
    vote_targets: jax.Array,
    vote_mask: jax.Array,
    cfg: VoteSegmentorConfig,
):
    """CE (bg weight 0.1, ×10) + L1 vote loss on sqrt targets (config
    FSF_nuScenes_config.py:87-94)."""
    n_cls = cfg.num_classes + 1
    class_weight = jnp.concatenate(
        [jnp.ones((cfg.num_classes,)), jnp.asarray([cfg.bg_class_weight])]
    )
    valid = out["valid"]
    ce = L.softmax_ce_loss(out["seg_logits"], labels, class_weight)
    # mmcv CE with class_weight normalizes by the sum of sample weights
    w_per = class_weight[labels.clip(0, n_cls - 1)] * valid
    loss_sem = cfg.seg_loss_weight * jnp.sum(ce * valid) / jnp.maximum(w_per.sum(), 1.0)

    votes = out["vote_preds"].reshape(-1, n_cls, 3)
    safe_lab = labels.clip(0, n_cls - 1)
    # one-hot class select (not take_along_axis — slow on TPU)
    oh = (jnp.arange(n_cls) == safe_lab[:, None]).astype(votes.dtype)
    picked = jnp.einsum("nc,ncd->nd", oh, votes)
    vm = (vote_mask & valid).astype(picked.dtype)
    loss_vote = cfg.vote_loss_weight * jnp.sum(
        jnp.abs(picked - vote_targets) * vm[:, None]
    ) / jnp.maximum(vm.sum() * 3, 1.0)
    return dict(loss_sem_seg=loss_sem, loss_vote=loss_vote)
