"""SIR (Sparse Instance Recognition) backbone.

Re-design of the reference SIR (models/backbones/sir.py:13-86): N stacked
SIRLayer blocks; each block consumes cat(normalized-xyz+point-channels,
previous point feats) and emits point feats + per-cluster feats; the final
cluster feature is the concat of all blocks' cluster features
(num_blocks × Σ feat_channels, e.g. 3 × 256 = 768 for the shipped config).

Groups are (class, batch, cluster) tuples in the LiDAR branch and
(batch, object-id) in the frustum branch — callers pre-linearize them into a
``SegmentInfo`` once (the reference's ``unique_once=True``).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.segment import SegmentInfo
from .vfe import SIRLayer


class SIR(nn.Module):
    num_blocks: int = 3
    feat_channels: Sequence[Sequence[int]] = ((128, 128),) * 3
    rel_mlp_hidden_dims: Sequence[Sequence[int]] = ((16, 32),) * 3
    norm: str = "ln"
    mode: str = "max"
    xyz_normalizer: Tuple[float, float, float] = (20.0, 20.0, 4.0)
    act: str = "gelu"

    @nn.compact
    def __call__(
        self,
        points: jax.Array,    # [N, D] point channels (xyz first, raw scale)
        features: jax.Array,  # [N, C] input point features
        f_cluster: jax.Array,  # [N, 3] offsets to cluster center (rel feats)
        seg: SegmentInfo,
        valid: jax.Array,
        train: bool = False,
    ):
        norm_xyz = points[:, :3] / jnp.asarray(self.xyz_normalizer, points.dtype)
        pts = jnp.concatenate([norm_xyz, points[:, 3:]], axis=1)
        out_feats = features
        cluster_feat_list = []
        for i in range(self.num_blocks):
            in_feats = jnp.concatenate([pts, out_feats], axis=1)
            out_feats, cluster_feats = SIRLayer(
                feat_channels=tuple(self.feat_channels[i]),
                rel_mlp_hidden_dims=tuple(self.rel_mlp_hidden_dims[i]),
                mode=self.mode,
                norm=self.norm,
                act=self.act,
            )(in_feats, f_cluster, seg, valid, train)
            cluster_feat_list.append(cluster_feats)
        final_cluster_feats = jnp.concatenate(cluster_feat_list, axis=1)
        return out_feats, final_cluster_feats
