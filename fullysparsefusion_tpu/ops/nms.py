"""Static-shape rotated NMS — TPU replacement for mmcv ``nms_gpu`` /
mmdet3d ``box3d_multiclass_nms`` (reference usage: sparse_cluster_head.py:571,
per-task NMS in sparse_cluster_head_v2.get_bboxes with cfg
use_rotate_nms=True, nms_thr, score_thr, max_num — FSF_nuScenes_config.py:178-184).

The classic greedy NMS is inherently sequential; with static shapes it becomes
a ``fori_loop`` over the score-sorted candidate list with a running
suppression mask. The IoU matrix is precomputed once (vectorized rotated
polygon clip from ops.geometry), so each iteration is a cheap [N] vector op.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import boxes_iou_bev


def nms_bev_mask(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    iou_thr: float,
) -> jax.Array:
    """Greedy rotated-BEV NMS keep mask (original order).

    Args:
      boxes: [N, 7+] LiDAR boxes.
      scores: [N].
      valid: [N] bool — invalid rows never kept, never suppress.
      iou_thr: suppression threshold (IoU > thr suppresses).
    Returns keep: [N] bool.
    """
    n = boxes.shape[0]
    neg = jnp.finfo(scores.dtype).min
    masked_scores = jnp.where(valid, scores, neg)
    order = jnp.argsort(-masked_scores, stable=True)
    b = boxes[order]
    v = valid[order]
    iou = boxes_iou_bev(b, b)

    def body(i, state):
        keep, suppressed = state
        can = v[i] & ~suppressed[i]
        keep = keep.at[i].set(can)
        row = (iou[i] > iou_thr) & can
        suppressed = suppressed | row
        return keep, suppressed

    keep_sorted, _ = jax.lax.fori_loop(
        0, n, body, (jnp.zeros((n,), bool), jnp.zeros((n,), bool))
    )
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


class NMSResult(NamedTuple):
    boxes: jax.Array   # [max_num, code]
    scores: jax.Array  # [max_num]
    labels: jax.Array  # [max_num] int32
    valid: jax.Array   # [max_num] bool


def multiclass_nms_bev(
    boxes: jax.Array,
    scores: jax.Array,
    labels: jax.Array,
    valid: jax.Array,
    num_classes: int,
    iou_thr: float,
    score_thr: float,
    max_num: int,
) -> NMSResult:
    """Class-wise rotated NMS then global top-k, static shapes throughout.

    Matches box3d_multiclass_nms semantics: NMS runs independently per class
    (via a per-class validity mask — no dynamic gathering needed), results are
    merged and the global top ``max_num`` by score survive.
    """
    valid = valid & (scores > score_thr)

    def per_class(c):
        m = valid & (labels == c)
        return nms_bev_mask(boxes, scores, m, iou_thr)

    keeps = jax.vmap(per_class)(jnp.arange(num_classes))  # [C, N]
    keep = jnp.any(keeps, axis=0) & valid

    neg = jnp.finfo(scores.dtype).min
    final_scores = jnp.where(keep, scores, neg)
    k = min(max_num, final_scores.shape[0])
    topk_scores, topk_idx = jax.lax.top_k(final_scores, k)
    if k < max_num:  # pad to the static max_num contract
        pad = max_num - k
        topk_scores = jnp.concatenate([topk_scores, jnp.full((pad,), neg, scores.dtype)])
        topk_idx = jnp.concatenate([topk_idx, jnp.zeros((pad,), topk_idx.dtype)])
    out_valid = topk_scores > neg
    return NMSResult(
        boxes=boxes[topk_idx],
        scores=jnp.where(out_valid, topk_scores, 0.0),
        labels=jnp.where(out_valid, labels[topk_idx], -1),
        valid=out_valid,
    )
