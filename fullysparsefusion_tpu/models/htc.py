"""Hybrid Task Cascade (HTC) 2D instance segmentation — TPU-native inference.

The reference's offline mask pre-inference runs mmdet's HTC-X101-64x4d-DCN
over all camera images (tools/mask_tools/save_mask_nusc.py:195-218, config
projects/configs/_base_/nuimages/htc_x101_64x4d_fpn_dconv_c3-c5_coco-20e_
16x1_20e_nuim.py) and writes per-(cam, class) instance-id PNGs that FSF
consumes. This module is the phase-2 JAX port (SURVEY §2.7-13): the full
inference graph — ResNeXt-101-64x4d backbone with DCN at c3–c5, FPN, RPN,
three interleaved cascade bbox stages with fused-semantic RoI features, and
mask heads with mask-info flow — with every data-dependent set held in the
library's fixed-capacity ``(data, valid)`` form.

TPU notes: all RoI work is bilinear row gathers + MXU matmuls
(ops/roi_align.py, ops/dcn.py); NMS reuses the Pallas-accelerated greedy
scan (ops/nms.py). Inference-only: the reference never trains HTC inside
FSF — it loads the released nuImages checkpoint — so BN runs frozen on
stored statistics and no losses are defined. Weight conversion from the
mmdet checkpoint: tools/convert_checkpoint.py::map_htc.

Fidelity choices, matching the config chain
(htc_without_semantic_r50_fpn_1x_nuim.py):
  * anchors: scales [8], ratios [0.5, 1, 2], strides [4, 8, 16, 32, 64];
  * RPN test: per-level top-1000, delta decode, clip, PER-LEVEL greedy NMS
    @0.7 (mmdet batched_nms with level ids), top max_per_img=1000;
  * cascade: class-agnostic delta decode, per-stage stds (.1/.05/.033 …),
    scores = mean of the three stages' softmax;
  * detections: per-class NMS @0.5 above score 0.001, top 100;
  * masks: 14×14 RoIAlign + semantic feature, three heads with info flow,
    logits averaged then sigmoid (28×28, per final class).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dcn import deform_conv2d
from ..ops.geometry import axis_aligned_iou_2d
from ..ops.nms import nms_mask_from_iou
from ..ops.roi_align import multilevel_roi_align, roi_align

# ImageNet / mmdet normalization (htc_r50_fpn_1x_nuim.py img_norm_cfg)
IMG_MEAN = (123.675, 116.28, 103.53)
IMG_STD = (58.395, 57.12, 57.375)

NUIM_CLASSES = (
    "car", "truck", "trailer", "bus", "construction_vehicle", "bicycle",
    "motorcycle", "pedestrian", "traffic_cone", "barrier",
)


class BN(nn.Module):
    """Frozen inference BatchNorm (mmdet norm_eval=True): running stats."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32))
        inv = jax.lax.rsqrt(var.value + 1e-5) * scale
        return x * inv + (bias - mean.value * inv)


class DeformConvBlock(nn.Module):
    """DCNv1 3×3 (deform_groups=1) with conv groups — replaces the grouped
    3×3 in ResNeXt bottlenecks at c3–c5 (stage_with_dcn=(F,T,T,T))."""
    features: int
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        # offset branch: plain 3×3 conv → 18 channels (dy,dx × 9), zero init
        w_off = self.param("conv_offset_w", nn.initializers.zeros,
                           (3, 3, cin, 18))
        b_off = self.param("conv_offset_b", nn.initializers.zeros, (18,))
        off = jax.lax.conv_general_dilated(
            x, w_off, (self.stride, self.stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_off
        w = self.param(
            "w", nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (3, 3, cin // self.groups, self.features))
        return deform_conv2d(x, off, w, None, stride=self.stride, padding=1,
                             groups=self.groups)


class Bottleneck(nn.Module):
    """ResNeXt bottleneck, torch 'pytorch style' (stride on the 3×3)."""
    mid: int
    out: int
    stride: int = 1
    groups: int = 64
    dcn: bool = False
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        idn = x
        y = nn.Conv(self.mid, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(BN(name="bn1")(y))
        if self.dcn:
            y = DeformConvBlock(self.mid, self.stride, self.groups,
                                name="conv2")(y)
        else:
            y = nn.Conv(self.mid, (3, 3), (self.stride, self.stride),
                        padding=1, feature_group_count=self.groups,
                        use_bias=False, name="conv2")(y)
        y = nn.relu(BN(name="bn2")(y))
        y = nn.Conv(self.out, (1, 1), use_bias=False, name="conv3")(y)
        y = BN(name="bn3")(y)
        if self.downsample:
            idn = nn.Conv(self.out, (1, 1), (self.stride, self.stride),
                          use_bias=False, name="ds_conv")(x)
            idn = BN(name="ds_bn")(idn)
        return nn.relu(y + idn)


class ResNeXt(nn.Module):
    """ResNeXt-101 64×4d, DCN at stages 2–4 (reference backbone cfg)."""
    depth_blocks: Sequence[int] = (3, 4, 23, 3)
    groups: int = 64
    base_width: int = 4
    stage_with_dcn: Sequence[bool] = (False, True, True, True)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    name="stem_conv")(x)
        x = nn.relu(BN(name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        outs = []
        planes = 64
        for si, nblocks in enumerate(self.depth_blocks):
            out_ch = planes * 4
            # torchvision ResNeXt width: int(planes·base_width/64)·groups
            mid = int(planes * self.base_width / 64) * self.groups
            for bi in range(nblocks):
                x = Bottleneck(
                    mid=mid, out=out_ch,
                    stride=2 if (bi == 0 and si > 0) else 1,
                    groups=self.groups, dcn=self.stage_with_dcn[si],
                    downsample=bi == 0, name=f"layer{si + 1}_{bi}",
                )(x)
            outs.append(x)
            planes *= 2
        return outs  # C2..C5, strides 4/8/16/32


class FPN(nn.Module):
    """mmdet FPN(num_outs=5): laterals + top-down nearest, P6 = maxpool."""
    out_channels: int = 256

    @nn.compact
    def __call__(self, inputs: List[jax.Array]) -> List[jax.Array]:
        lats = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral{i}")(c)
            for i, c in enumerate(inputs)
        ]
        for i in range(len(lats) - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(lats[i], 2, axis=1), 2, axis=2)
            lats[i - 1] = lats[i - 1] + up[:, : lats[i - 1].shape[1],
                                           : lats[i - 1].shape[2]]
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, name=f"fpn{i}")(l)
            for i, l in enumerate(lats)
        ]
        outs.append(nn.max_pool(outs[-1], (1, 1), (2, 2)))
        return outs  # P2..P6


class RPNHead(nn.Module):
    num_anchors: int = 3

    @nn.compact
    def __call__(self, feats: List[jax.Array]):
        cls_all, reg_all = [], []
        conv = nn.Conv(256, (3, 3), padding=1, name="rpn_conv")
        cls = nn.Conv(self.num_anchors, (1, 1), name="rpn_cls")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), name="rpn_reg")
        for f in feats:
            h = nn.relu(conv(f))
            cls_all.append(cls(h))
            reg_all.append(reg(h))
        return cls_all, reg_all


class Shared2FCBBoxHead(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, roi_feats):  # [N, 7, 7, C]
        n = roi_feats.shape[0]
        # torch flattens CHW; transpose so converted fc weights line up
        x = roi_feats.transpose(0, 3, 1, 2).reshape(n, -1)
        x = nn.relu(nn.Dense(1024, name="fc1")(x))
        x = nn.relu(nn.Dense(1024, name="fc2")(x))
        cls = nn.Dense(self.num_classes + 1, name="fc_cls")(x)
        reg = nn.Dense(4, name="fc_reg")(x)  # reg_class_agnostic=True
        return cls, reg


class HTCMaskHead(nn.Module):
    num_classes: int = 10
    with_conv_res: bool = True

    @nn.compact
    def __call__(self, x, res_feat: Optional[jax.Array] = None):
        if res_feat is not None:
            assert self.with_conv_res
            x = x + nn.relu(
                nn.Conv(256, (1, 1), name="conv_res")(res_feat))
        for i in range(4):
            x = nn.relu(nn.Conv(256, (3, 3), padding=1, name=f"conv{i}")(x))
        feat = x
        # 2×2-stride-2 deconv with exact torch ConvTranspose2d semantics
        # (out[2i+a, 2j+b] = Σ_c in[i,j,c]·w[a,b,c,o]) so converted mmdet
        # weights drop in without kernel-flip ambiguity
        wup = self.param("upsample_w",
                         nn.initializers.variance_scaling(2.0, "fan_out",
                                                          "normal"),
                         (2, 2, 256, 256))
        bup = self.param("upsample_b", nn.initializers.zeros, (256,))
        n, h, w = x.shape[0], x.shape[1], x.shape[2]
        x = jnp.einsum("nhwc,abco->nhawbo", x, wup).reshape(
            n, h * 2, w * 2, 256) + bup
        x = nn.relu(x)
        logits = nn.Conv(self.num_classes, (1, 1), name="conv_logits")(x)
        return logits, feat


class FusedSemanticHead(nn.Module):
    """Stride-8 fused semantic branch; returns the 256-ch embedding the RoI
    heads consume (htc_r50_fpn_1x_nuim.py semantic_head)."""
    num_ins: int = 5
    fusion_level: int = 1
    num_classes: int = 32

    @nn.compact
    def __call__(self, feats: List[jax.Array]):
        base = nn.Conv(256, (1, 1),
                       name=f"lateral{self.fusion_level}")(
            feats[self.fusion_level])
        hb, wb = base.shape[1:3]
        for i, f in enumerate(feats[: self.num_ins]):
            if i == self.fusion_level:
                continue
            f = jax.image.resize(f, (f.shape[0], hb, wb, f.shape[3]),
                                 "bilinear")
            base = base + nn.Conv(256, (1, 1), name=f"lateral{i}")(f)
        x = base
        for i in range(4):
            x = nn.relu(nn.Conv(256, (3, 3), padding=1, name=f"conv{i}")(x))
        logits = nn.Conv(self.num_classes, (1, 1), name="conv_logits")(x)
        embed = nn.Conv(256, (1, 1), name="conv_embedding")(x)
        return logits, embed


# ---------------------------------------------------------------- anchors

RPN_STRIDES = (4, 8, 16, 32, 64)


def base_anchors(stride: int, scale: float = 8.0,
                 ratios=(0.5, 1.0, 2.0)) -> jnp.ndarray:
    """mmdet AnchorGenerator base anchors (center_offset=0) → [A, 4]."""
    out = []
    for r in ratios:
        w = stride * scale / (r ** 0.5)
        h = stride * scale * (r ** 0.5)
        out.append([-w / 2, -h / 2, w / 2, h / 2])
    return jnp.asarray(out, jnp.float32)


def level_anchors(stride: int, h: int, w: int) -> jnp.ndarray:
    """All anchors of one level → [H·W·A, 4] xyxy."""
    base = base_anchors(stride)  # [A, 4]
    ys = jnp.arange(h, dtype=jnp.float32) * stride
    xs = jnp.arange(w, dtype=jnp.float32) * stride
    cx, cy = jnp.meshgrid(xs, ys)  # [h, w]
    shift = jnp.stack([cx, cy, cx, cy], -1).reshape(-1, 1, 4)
    return (shift + base[None]).reshape(-1, 4)


def delta_decode(rois: jax.Array, deltas: jax.Array,
                 stds: Tuple[float, float, float, float],
                 img_hw: Tuple[int, int]) -> jax.Array:
    """mmdet DeltaXYWHBBoxCoder.decode (means 0), clipped to the image."""
    sx, sy, sw, sh = stds
    w = rois[:, 2] - rois[:, 0]
    h = rois[:, 3] - rois[:, 1]
    cx = rois[:, 0] + w * 0.5
    cy = rois[:, 1] + h * 0.5
    max_ratio = jnp.abs(jnp.log(jnp.float32(16.0 / 1000.0)))
    dw = jnp.clip(deltas[:, 2] * sw, -max_ratio, max_ratio)
    dh = jnp.clip(deltas[:, 3] * sh, -max_ratio, max_ratio)
    ncx = cx + deltas[:, 0] * sx * w
    ncy = cy + deltas[:, 1] * sy * h
    nw = w * jnp.exp(dw)
    nh = h * jnp.exp(dh)
    out = jnp.stack([ncx - nw / 2, ncy - nh / 2,
                     ncx + nw / 2, ncy + nh / 2], -1)
    hh, ww = img_hw
    return jnp.clip(out, 0.0,
                    jnp.asarray([ww, hh, ww, hh], jnp.float32) - 1.0)


class Detections(NamedTuple):
    boxes: jax.Array    # [D, 4] xyxy image px
    scores: jax.Array   # [D]
    labels: jax.Array   # [D] int32 (nuImages class ids)
    masks: jax.Array    # [D, 28, 28] probabilities within the box
    valid: jax.Array    # [D] bool


class HTC(nn.Module):
    """Full HTC inference graph for one image batch [N, H, W, 3] (RGB 0-255).

    Static capacities: ``num_proposals`` RPN outputs, ``max_dets``
    detections per image. Heavyweight by design — it is the OFFLINE
    pre-inference model (SURVEY L6), never in the 3D serving path.
    """
    num_classes: int = 10
    num_proposals: int = 1000
    rpn_pre_nms: int = 1000
    max_dets: int = 100
    depth_blocks: Tuple[int, int, int, int] = (3, 4, 23, 3)
    stage_stds: Tuple = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
                         (0.033, 0.033, 0.067, 0.067))

    def setup(self):
        self.backbone = ResNeXt(depth_blocks=self.depth_blocks,
                                name="backbone")
        self.neck = FPN(name="neck")
        self.rpn = RPNHead(name="rpn_head")
        self.bbox_heads = [Shared2FCBBoxHead(self.num_classes,
                                             name=f"bbox_head{i}")
                           for i in range(3)]
        self.mask_heads = [HTCMaskHead(self.num_classes, with_conv_res=i > 0,
                                       name=f"mask_head{i}")
                           for i in range(3)]
        self.semantic = FusedSemanticHead(name="semantic_head")

    def _normalize(self, images):
        mean = jnp.asarray(IMG_MEAN, jnp.float32)
        std = jnp.asarray(IMG_STD, jnp.float32)
        return (images - mean) / std

    def _proposals(self, cls_lvls, reg_lvls, img_hw):
        """RPN get_bboxes for one image (leading dim already indexed)."""
        boxes_all, scores_all, lvl_all = [], [], []
        for li, (cls, reg) in enumerate(zip(cls_lvls, reg_lvls)):
            h, w = cls.shape[0], cls.shape[1]
            scores = jax.nn.sigmoid(cls.reshape(-1))          # [h·w·A]
            deltas = reg.reshape(-1, 4)
            anchors = level_anchors(RPN_STRIDES[li], h, w)
            k = min(self.rpn_pre_nms, scores.shape[0])
            top, idx = jax.lax.top_k(scores, k)
            dec = delta_decode(anchors[idx], deltas[idx],
                               (1.0, 1.0, 1.0, 1.0), img_hw)
            boxes_all.append(dec)
            scores_all.append(top)
            lvl_all.append(jnp.full((k,), li, jnp.int32))
        boxes = jnp.concatenate(boxes_all)
        scores = jnp.concatenate(scores_all)
        lvls = jnp.concatenate(lvl_all)
        # batched_nms semantics: suppression only within a level — offset
        # each level into a disjoint coordinate range
        span = jnp.float32(max(img_hw) + 2)
        off = boxes + (lvls[:, None] * span)
        iou = axis_aligned_iou_2d(off, off)
        keep = nms_mask_from_iou(iou, scores, jnp.ones_like(scores, bool), 0.7)
        kscores = jnp.where(keep, scores, -1.0)
        top, idx = jax.lax.top_k(kscores, self.num_proposals)
        return boxes[idx], top > 0.0

    def _roi_feats(self, pyramid, sem_feat, rois, valid, out_size):
        rf = multilevel_roi_align(
            [p for p in pyramid[:4]], RPN_STRIDES[:4], rois, valid, out_size)
        sf = roi_align(sem_feat, rois, valid, 14, 1.0 / 8.0)
        if out_size != 14:
            sf = sf.reshape(sf.shape[0], out_size, 14 // out_size,
                            out_size, 14 // out_size, -1).mean((2, 4))
        return rf + sf

    def __call__(self, images: jax.Array) -> List[Detections]:
        """images [N, H, W, 3] uint8/float RGB → per-image Detections."""
        n, ih, iw = images.shape[0], images.shape[1], images.shape[2]
        x = self._normalize(images.astype(jnp.float32))
        pyramid = self.neck(self.backbone(x))
        cls_lvls, reg_lvls = self.rpn(pyramid)
        _, sem_embed = self.semantic(pyramid)

        out = []
        for b in range(n):  # python loop: N is static and tiny (6 cams)
            pyr_b = [p[b] for p in pyramid]
            sem_b = sem_embed[b]
            rois, rvalid = self._proposals(
                [c[b] for c in cls_lvls], [r[b] for r in reg_lvls], (ih, iw))
            # --- cascade bbox stages
            ms_scores = []
            for si in range(3):
                feats = self._roi_feats(pyr_b, sem_b, rois, rvalid, 7)
                cls, reg = self.bbox_heads[si](feats)
                ms_scores.append(jax.nn.softmax(cls, -1))
                rois = delta_decode(rois, reg, self.stage_stds[si], (ih, iw))
            scores = sum(ms_scores) / 3.0                     # [P, C+1]
            dets = self._multiclass_nms(rois, scores, rvalid, (ih, iw))
            # --- mask stages with info flow
            mfeats = self._roi_feats(pyr_b, sem_b, dets.boxes, dets.valid, 14)
            last = None
            mlogits = []
            for si in range(3):
                lg, last = self.mask_heads[si](mfeats, last)
                mlogits.append(lg)
            probs = jax.nn.sigmoid(sum(mlogits) / 3.0)        # [D,28,28,C]
            sel = jax.nn.one_hot(dets.labels, self.num_classes,
                                 dtype=probs.dtype)
            masks = jnp.einsum("dhwc,dc->dhw", probs, sel)
            out.append(Detections(dets.boxes, dets.scores, dets.labels,
                                  masks, dets.valid))
        return out

    def _multiclass_nms(self, rois, scores, valid, img_hw,
                        score_thr: float = 0.001, iou_thr: float = 0.5):
        """mmdet multiclass_nms: per-class greedy NMS, top max_dets."""
        iou = axis_aligned_iou_2d(rois, rois)                 # shared: boxes
        all_scores, all_labels = [], []                       # are per-roi
        for c in range(self.num_classes):
            sc = scores[:, c]
            ok = valid & (sc > score_thr)
            keep = nms_mask_from_iou(iou, sc, ok, iou_thr)
            all_scores.append(jnp.where(keep, sc, -1.0))
            all_labels.append(jnp.full(sc.shape, c, jnp.int32))
        flat_scores = jnp.concatenate(all_scores)
        flat_labels = jnp.concatenate(all_labels)
        top, idx = jax.lax.top_k(flat_scores, self.max_dets)
        roi_idx = idx % rois.shape[0]
        return Detections(
            boxes=rois[roi_idx], scores=top, labels=flat_labels[idx],
            masks=jnp.zeros((self.max_dets, 28, 28)), valid=top > 0.0)


def build_htc(rng: jax.Array, img_hw: Tuple[int, int] = (928, 1600),
              **kw) -> Tuple[HTC, dict]:
    """Construct + init an HTC (random weights; see map_htc for converted)."""
    model = HTC(**kw)
    dummy = jnp.zeros((1, img_hw[0], img_hw[1], 3), jnp.float32)
    vars_ = model.init(rng, dummy)
    return model, vars_
