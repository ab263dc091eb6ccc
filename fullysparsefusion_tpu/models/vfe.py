"""Segment-VFE module family.

One parameterized design covers the reference's three modified-mmdet3d voxel
encoders (SURVEY.md §2.7 item 15): ``DynamicScatterVFE`` (voxel encoder,
config FSF_nuScenes_config.py:42-52), ``SIRLayer`` (the block inside the SIR
backbone and the RoI bbox head), and ``DynamicClusterVFE``. The shared shape:

    per-point features → [rel-pos MLP modulation] →
    repeat { Linear → Norm → Act → segment-reduce → concat-back } →
    (point-level feats, group-level feats)

All group-bys run against a precomputed ``SegmentInfo`` (static capacity),
replacing torch.unique + torch_scatter.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.segment import SegmentInfo, segment_max, segment_mean
from .layers import MLP, Norm, get_activation


def _reduce(feat, seg: SegmentInfo, mode: str):
    if mode == "max":
        return segment_max(feat, seg.seg_id, seg.capacity)
    if mode in ("mean", "avg"):
        return segment_mean(feat, seg.seg_id, seg.capacity, counts=seg.counts)
    raise ValueError(mode)


class DynamicVFELayer(nn.Module):
    """Linear → Norm → Act (one VFE layer)."""

    out_channels: int
    norm: str = "bn"
    act: str = "relu"
    norm_eps: float = 1e-3

    @nn.compact
    def __call__(self, x, valid, train: bool):
        x = nn.Dense(self.out_channels, use_bias=False)(x)
        x = Norm(kind=self.norm, eps=self.norm_eps)(x, valid, train)
        return get_activation(self.act)(x)


class DynamicScatterVFE(nn.Module):
    """Voxel feature encoder (reference config type 'DynamicScatterVFE').

    Input [N, in] point features; optional cluster-center / voxel-center
    offset features are appended; two VFE layers with a segment reduce and
    concat-back between them; final segment reduce gives voxel features.
    """

    feat_channels: Sequence[int] = (64, 64)
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 0.2)
    pc_range_min: Tuple[float, float, float] = (-51.2, -51.2, -5.0)
    mode: str = "max"
    norm: str = "bn"
    act: str = "relu"

    @nn.compact
    def __call__(
        self,
        points: jax.Array,      # [N, D] raw point features (xyz first)
        seg: SegmentInfo,       # voxel grouping
        voxel_coords: jax.Array,  # [cap, 3] int32 xyz voxel coords
        valid: jax.Array,       # [N] bool
        train: bool = False,
    ):
        xyz = points[:, :3]
        feats = [points]
        if self.with_cluster_center:
            mean_xyz = segment_mean(xyz, seg.seg_id, seg.capacity, counts=seg.counts)
            feats.append(xyz - mean_xyz[seg.seg_id.clip(0, seg.capacity - 1)])
        if self.with_voxel_center:
            vs = jnp.asarray(self.voxel_size, xyz.dtype)
            lo = jnp.asarray(self.pc_range_min, xyz.dtype)
            centers = voxel_coords.astype(xyz.dtype) * vs + vs * 0.5 + lo
            feats.append(xyz - centers[seg.seg_id.clip(0, seg.capacity - 1)])
        x = jnp.concatenate(feats, axis=1)
        x = x * valid[:, None].astype(x.dtype)

        n_layers = len(self.feat_channels)
        voxel_feats = None
        for i, c in enumerate(self.feat_channels):
            x = DynamicVFELayer(c, norm=self.norm, act=self.act)(x, valid, train)
            x = x * valid[:, None].astype(x.dtype)
            voxel_feats = _reduce(x, seg, self.mode)
            if i != n_layers - 1:
                x = jnp.concatenate(
                    [x, voxel_feats[seg.seg_id.clip(0, seg.capacity - 1)]], axis=1
                )
                x = x * valid[:, None].astype(x.dtype)
        return voxel_feats  # [cap, feat_channels[-1]]


class SIRLayer(nn.Module):
    """One SIR block: rel-pos-modulated PointNet over (batch, group) segments.

    Matches the reference SIRLayer surface (built by sir.py:40-62 and
    fsd_bbox_head.py:61-87): per-layer Linear→Norm→Act, segment reduce after
    each layer, concat-back of group feats between layers; the block's group
    output is the concat of every layer's reduced features, and the point
    output is the last layer's point features.
    """

    feat_channels: Sequence[int] = (128, 128)
    rel_mlp_hidden_dims: Sequence[int] = (16, 32)
    with_rel_mlp: bool = True
    pos_fusion: str = "mul"     # how rel encoding modulates inputs
    mode: str = "max"
    norm: str = "ln"
    act: str = "gelu"
    norm_eps: float = 1e-3
    rel_dist_scaler: float = 10.0

    @nn.compact
    def __call__(
        self,
        in_feats: jax.Array,   # [N, C] (already includes xyz-bearing features)
        rel_feats: jax.Array,  # [N, R] geometric offsets (e.g. point − center)
        seg: SegmentInfo,
        valid: jax.Array,
        train: bool = False,
    ):
        x = in_feats
        if self.with_rel_mlp:
            pe = MLP(
                tuple(self.rel_mlp_hidden_dims) + (in_feats.shape[-1],),
                norm="none",
                act=self.act,
                bias=True,
            )(rel_feats / self.rel_dist_scaler, valid, train)
            if self.pos_fusion == "mul":
                x = x * pe
            elif self.pos_fusion == "add":
                x = x + pe
            else:
                raise ValueError(self.pos_fusion)
        x = x * valid[:, None].astype(x.dtype)

        group_feat_list = []
        n_layers = len(self.feat_channels)
        for i, c in enumerate(self.feat_channels):
            x = DynamicVFELayer(c, norm=self.norm, act=self.act, norm_eps=self.norm_eps)(
                x, valid, train
            )
            x = x * valid[:, None].astype(x.dtype)
            g = _reduce(x, seg, self.mode)
            group_feat_list.append(g)
            if i != n_layers - 1:
                x = jnp.concatenate([x, g[seg.seg_id.clip(0, seg.capacity - 1)]], axis=1)
                x = x * valid[:, None].astype(x.dtype)
        group_feats = jnp.concatenate(group_feat_list, axis=1)
        return x, group_feats  # point [N, c_last], group [cap, Σc]
