"""Configuration dataclasses for the TPU-native FSF framework.

These are the *native* config surface. A thin interpreter
(``fullysparsefusion_tpu.config_compat``) maps the reference's mmcv config
dicts (projects/configs/nuScenes/FSF_nuScenes_config.py et al.) onto these,
so users of the reference can load their configs unchanged.

The one concept with no reference counterpart is ``Capacities``: every
data-dependent set (points, voxels, foreground, clusters, RoI points) gets a
static capacity so XLA compiles a single program (SURVEY.md §7
"static-capacity bucketing" — the TPU analog of the reference's dynamic
shapes).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

NUSC_CLASS_NAMES = (
    "car", "truck", "trailer", "bus", "construction_vehicle",
    "bicycle", "motorcycle", "pedestrian", "traffic_cone", "barrier",
)
NUSC_GROUPS = (
    ("car",),
    ("truck", "construction_vehicle"),
    ("bus", "trailer"),
    ("barrier",),
    ("motorcycle", "bicycle"),
    ("pedestrian", "traffic_cone"),
)


@dataclass(frozen=True)
class Capacities:
    """Static capacities (per global batch unless noted)."""

    points: int = 32768          # padded raw points
    voxels: int = 16384          # segmentation-voxelization capacity
    prevox: int = 16384          # 0.1 m pre-voxelization capacity
    fg_per_group: int = 2048     # compacted foreground points per class-group
    # clustering-voxel capacity per group. The batched CCL re-slots this
    # per sample (models/fsd.cluster_all_groups), so provision it as
    # batch_size × the worst single-sample voxel count, not the batch sum.
    cluster_voxels_per_group: int = 1024
    clusters: int = 512          # total cluster (query) capacity
    max_gt: int = 128            # padded GT boxes per sample
    # camera branch
    frustum_points: int = 8192   # compacted in-mask foreground points
    frustum_objects: int = 256   # camera-query capacity
    # refinement
    roi_points: int = 16384      # total pooled points across RoIs
    max_roi_points: int = 512    # per-RoI point cap (reference max_inbox_point)
    out_boxes: int = 500         # NMS max_num


def _small_caps() -> Capacities:
    """Tiny capacities for tests."""
    return Capacities(
        points=2048, voxels=2048, prevox=2048, fg_per_group=256,
        cluster_voxels_per_group=128, clusters=128, max_gt=16,
        frustum_points=512, frustum_objects=32, roi_points=1024,
        max_roi_points=64, out_boxes=64,
    )


@dataclass(frozen=True)
class VoteSegmentorConfig:
    """VoteSegmentor (reference FSF_nuScenes_config.py:33-103)."""

    num_classes: int = 10
    point_dim: int = 5
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 0.2)
    point_cloud_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    vfe_channels: Tuple[int, ...] = (64, 64)
    unet_base_channels: int = 64
    unet_output_channels: int = 128
    unet_encoder_channels: Tuple[Tuple[int, ...], ...] = (
        (128,), (128, 128, 128), (128, 128, 128), (256, 256, 256), (512, 512, 512)
    )
    unet_decoder_channels: Tuple[Tuple[int, ...], ...] = (
        (512, 512, 256), (256, 256, 128), (128, 128, 128), (128, 128, 128)
    )
    unet_strided_paddings: Tuple[Tuple[int, int, int], ...] = (
        (1, 1, 1), (1, 1, 1), (1, 1, 0), (1, 1, 1)
    )
    unet_capacity_divisors: Tuple[int, ...] = (1, 1, 2, 4, 8)
    # explicit per-stage active-set capacities (overrides the divisors when
    # set) — size these from measured occupancies, e.g. real nuScenes frames
    # run ~60k stage-0 voxels but only 15-25k after the first stride
    unet_stage_capacities: Optional[Tuple[int, ...]] = None
    # occupancy (capacity / grid cells) above which a stage's convs use the
    # dense scatter → MXU conv → gather-back path instead of tap gathers
    unet_dense_min_occupancy: float = 0.15
    # window-gather conv (w_size, blk, resid) for the gather-path convs
    # (ops/sparse_conv.WindowSpec; Pallas kernel with built-in exact
    # fallback). w_size=0 disables. Lives in config — NOT an env var — so
    # config_compat sees it and the bench runs what was validated
    # (docs/performance.md round-4 A/B). DEFAULT ON at W=192 since the
    # per-stage table cache landed: full bench 119.2 vs 130.3 ms/frame
    # (2026-08-19, real v5e — round 3's per-conv table build was the loss).
    # Ineligible shapes (cap % blk != 0, non-3³ kernels, non-TPU backends)
    # fall back to the XLA gather conv automatically. An optional 4th
    # element (w, blk, resid, bwd) gates the BACKWARD window dispatch:
    # bwd=0 keeps d_feats on the XLA gather conv (both exact —
    # ops/sparse_conv._window_bwd_on; measured choice per
    # docs/performance.md round-4 train A/B).
    unet_window_conv: Tuple[int, ...] = (192, 256, 64)
    # apply the window spec under train=True too. Default False — the
    # window kernel wins the inference forward but loses the training step
    # (+63 ms/step measured even with the backward on the gather conv,
    # docs/performance.md round-4 train A/B); like spconv's per-pass algo
    # autotuning, dispatch is a timing choice with identical numerics.
    unet_window_conv_train: bool = False
    head_hidden_dims: Tuple[int, ...] = (128, 128)
    # losses
    seg_loss_weight: float = 10.0
    vote_loss_weight: float = 1.0
    bg_class_weight: float = 0.1


@dataclass(frozen=True)
class HeadConfig:
    """SparseClusterHeadV2-family head (reference :125-156)."""

    num_classes: int = 10
    in_channel: int = 768
    shared_mlp_dims: Tuple[int, ...] = (1024, 1024)
    code_size: int = 10
    common_attrs: Tuple[Tuple[str, int, int, int], ...] = (
        ("center", 3, 2, 128), ("dim", 3, 2, 128), ("rot", 2, 2, 128), ("vel", 2, 2, 128)
    )
    num_cls_layer: int = 2
    cls_hidden_dim: int = 128
    act: str = "gelu"
    norm: str = "ln"
    focal_gamma: float = 4.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_center_weight: float = 0.5
    loss_size_weight: float = 0.5
    loss_rot_weight: float = 0.2
    loss_vel_weight: float = 0.2
    # optional corner loss (sparse_cluster_head.py:207-247; off in shipped cfgs)
    with_corner_loss: bool = False
    corner_delta: float = 1.0
    corner_loss_weight: float = 1.0
    # optional IoU-prediction branch (sparse_cluster_head.py:197-203,339-361)
    with_iou: bool = False
    iou_fg_thresh: float = 0.75
    iou_bg_thresh: float = 0.25
    loss_iou_weight: float = 1.0
    # IoU-branch label source: "iou" = piecewise-linear 3D-IoU labels
    # (sparse_cluster_head.py get_iou_labels :339-361); "dist" = BEV-distance
    # ramp on positives (frustum_cluster_head.py get_dist_labels :475-500)
    iou_label_mode: str = "iou"
    dist_min_thre: float = 0.3
    dist_max_thre: float = 2.0
    # test cfg
    nms_thr: float = 0.25
    score_thr: float = 0.05
    max_num: int = 500


@dataclass(frozen=True)
class FSDConfig:
    """LiDAR-query (FSD) branch (reference FSF_nuScenes_config.py:105-198)."""

    class_names: Tuple[str, ...] = NUSC_CLASS_NAMES
    group_names: Tuple[Tuple[str, ...], ...] = NUSC_GROUPS
    # CenterPoint-style task groups for the cluster head (reference
    # sparse_cluster_head_v2.py tasks=[dict(class_names=...)]). None → one
    # task containing every class (the shipped FSF configs). FSD-lineage
    # configs pass several tasks; loss/decode then run the per-task GT
    # remap + per-task NMS + global-label concat (:316-343,449-493,598-607).
    tasks: Optional[Tuple[Tuple[str, ...], ...]] = None
    segmentor: VoteSegmentorConfig = field(default_factory=VoteSegmentorConfig)
    head: HeadConfig = field(default_factory=HeadConfig)
    score_thresh: Tuple[float, ...] = (0.1,) * 6
    offset_weight: str = "max"
    pre_voxel_size: Tuple[float, float, float] = (0.1, 0.1, 0.1)
    cluster_voxel_sizes: Tuple[Tuple[float, float, float], ...] = (
        (0.3, 0.3, 8.0), (0.3, 0.3, 8.0), (0.3, 0.3, 8.0),
        (0.1, 0.1, 8.0), (0.2, 0.2, 8.0), (0.05, 0.05, 8.0),
    )
    connected_dists: Tuple[float, ...] = (0.6, 0.6, 0.6, 0.2, 0.4, 0.1)
    min_cluster_points: int = 2
    # SIR backbone
    sir_num_blocks: int = 3
    sir_feat_channels: Tuple[Tuple[int, ...], ...] = ((128, 128),) * 3
    sir_rel_mlp_hidden: Tuple[Tuple[int, ...], ...] = ((16, 32),) * 3
    sir_xyz_normalizer: Tuple[float, float, float] = (20.0, 20.0, 4.0)
    caps: Capacities = field(default_factory=Capacities)

    @property
    def num_classes(self) -> int:
        return len(self.class_names)

    @property
    def num_groups(self) -> int:
        return len(self.group_names)

    def group_class_ids(self) -> Tuple[Tuple[int, ...], ...]:
        return tuple(
            tuple(self.class_names.index(n) for n in g) for g in self.group_names
        )

    def task_tuple(self) -> Tuple[Tuple[str, ...], ...]:
        """Effective task groups — ``tasks`` or one task of every class."""
        return self.tasks if self.tasks else (self.class_names,)


@dataclass(frozen=True)
class FSFConfig:
    """Full LiDAR+camera fusion detector (reference FSF_nuScenes_config.py:105-411)."""

    fsd: FSDConfig = field(default_factory=FSDConfig)
    num_cams: int = 6
    overlap_k: int = 3            # static cap on multi-mask point duplication
    frustum_head: HeadConfig = field(
        default_factory=lambda: HeadConfig(
            in_channel=768 + 128, nms_thr=0.35, score_thr=0.01
        )
    )
    refined_head: HeadConfig = field(
        default_factory=lambda: HeadConfig(
            in_channel=1024, loss_cls_weight=2.0, nms_thr=0.35, score_thr=0.01
        )
    )
    encode_2d_dims: Tuple[int, ...] = (128, 128)
    embed_dims: int = 1024
    num_refine_stages: int = 1
    extra_wlh: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    refine_img_mlp_dims: Tuple[int, ...] = (32, 32)
    rois_per_point: int = 2
    # DistAssigner max BEV distance per class for the refined head
    # (FSF_nuScenes_config.py:343-360)
    refine_max_dist: Tuple[float, ...] = (
        1.0, 1.0, 2.0, 4.0, 0.5, 0.5, 0.5, 0.5, 0.5, 0.0
    )

    @property
    def caps(self) -> Capacities:
        return self.fsd.caps

    @property
    def num_classes(self) -> int:
        return self.fsd.num_classes


AV2_CLASS_NAMES = (
    "Regular_vehicle",
    "Pedestrian", "Bicyclist", "Motorcyclist", "Wheeled_rider",
    "Bollard", "Construction_cone", "Sign", "Construction_barrel",
    "Stop_sign", "Mobile_pedestrian_crossing_sign",
    "Large_vehicle", "Bus", "Box_truck", "Truck", "Vehicular_trailer",
    "Truck_cab", "School_bus", "Articulated_bus", "Message_board_trailer",
    "Bicycle", "Motorcycle", "Wheeled_device", "Wheelchair", "Stroller",
    "Dog",
)
AV2_GROUPS = (
    AV2_CLASS_NAMES[:1], AV2_CLASS_NAMES[1:5], AV2_CLASS_NAMES[5:11],
    AV2_CLASS_NAMES[11:20], AV2_CLASS_NAMES[20:25], AV2_CLASS_NAMES[25:],
)


def nusc_fsf_config(caps: Optional[Capacities] = None) -> FSFConfig:
    """Production nuScenes FSF (reference FSF_nuScenes_config.py)."""
    fsd = FSDConfig(caps=caps or Capacities())
    return FSFConfig(fsd=fsd)


def av2_fsf_config(caps: Optional[Capacities] = None) -> FSFConfig:
    """Production Argoverse 2 FSF (reference FSF_AV2_config.py): 26 classes,
    7 ring cameras, ±204.8 m range, code_size 8 (no velocity)."""
    n = len(AV2_CLASS_NAMES)
    seg = VoteSegmentorConfig(
        num_classes=n,
        point_dim=4,
        voxel_size=(0.2, 0.2, 0.2),
        point_cloud_range=(-204.8, -204.8, -3.2, 204.8, 204.8, 3.2),
    )
    common_attrs_no_vel = (
        ("center", 3, 2, 128), ("dim", 3, 2, 128), ("rot", 2, 2, 128)
    )
    head = HeadConfig(num_classes=n, code_size=8, common_attrs=common_attrs_no_vel)
    fsd = FSDConfig(
        class_names=AV2_CLASS_NAMES,
        group_names=AV2_GROUPS,
        segmentor=seg,
        head=head,
        score_thresh=(0.4, 0.25, 0.25, 0.25, 0.25, 0.25),
        cluster_voxel_sizes=(
            (0.3, 0.3, 6.4), (0.05, 0.05, 6.4), (0.08, 0.08, 6.4),
            (0.5, 0.5, 6.4), (0.1, 0.1, 6.4), (0.08, 0.08, 6.4),
        ),
        connected_dists=(0.6, 0.1, 0.15, 1.0, 0.2, 0.15),
        caps=caps or Capacities(),
    )
    frustum_head = HeadConfig(
        num_classes=n, code_size=8, common_attrs=common_attrs_no_vel,
        in_channel=768 + 128, nms_thr=0.35, score_thr=0.01,
    )
    refined_head = HeadConfig(
        num_classes=n, code_size=8, common_attrs=common_attrs_no_vel,
        in_channel=1024, loss_cls_weight=2.0, nms_thr=0.35, score_thr=0.01,
    )
    return FSFConfig(
        fsd=fsd,
        num_cams=7,
        frustum_head=frustum_head,
        refined_head=refined_head,
        refine_max_dist=(1.0,) * n,
    )


def tiny_fsf_config(**overrides) -> FSFConfig:
    """Small FSF config for CPU tests."""
    fsd = tiny_fsd_config()
    frustum_head = HeadConfig(
        in_channel=3 * 64 + 32,
        shared_mlp_dims=(64, 64),
        common_attrs=(
            ("center", 3, 2, 32), ("dim", 3, 2, 32), ("rot", 2, 2, 32), ("vel", 2, 2, 32)
        ),
        cls_hidden_dim=32,
        max_num=64,
        nms_thr=0.35,
        score_thr=0.01,
    )
    refined_head = HeadConfig(
        in_channel=128,
        shared_mlp_dims=(64, 64),
        common_attrs=(
            ("center", 3, 2, 32), ("dim", 3, 2, 32), ("rot", 2, 2, 32), ("vel", 2, 2, 32)
        ),
        cls_hidden_dim=32,
        max_num=64,
        loss_cls_weight=2.0,
        nms_thr=0.35,
        score_thr=0.01,
    )
    kw = dict(
        fsd=fsd,
        frustum_head=frustum_head,
        refined_head=refined_head,
        encode_2d_dims=(32, 32),
        embed_dims=128,
        refine_img_mlp_dims=(16, 16),
    )
    kw.update(overrides)
    return FSFConfig(**kw)


def tiny_fsd_config(**overrides) -> FSDConfig:
    """Small FSD config for CPU tests: tiny grids and capacities."""
    seg = VoteSegmentorConfig(
        voxel_size=(0.4, 0.4, 0.4),
        point_cloud_range=(-12.8, -12.8, -3.0, 12.8, 12.8, 3.2),
        vfe_channels=(16, 16),
        unet_base_channels=16,
        unet_output_channels=32,
        unet_encoder_channels=((16,), (32, 32), (64, 64)),
        unet_decoder_channels=((64, 32), (32, 32)),
        unet_strided_paddings=((1, 1, 1), (1, 1, 1)),
        unet_capacity_divisors=(1, 1, 2),
        head_hidden_dims=(32, 32),
    )
    head = HeadConfig(
        in_channel=3 * 64,
        shared_mlp_dims=(64, 64),
        common_attrs=(
            ("center", 3, 2, 32), ("dim", 3, 2, 32), ("rot", 2, 2, 32), ("vel", 2, 2, 32)
        ),
        cls_hidden_dim=32,
        max_num=64,
    )
    kw = dict(
        segmentor=seg,
        head=head,
        sir_feat_channels=((32, 32),) * 3,
        sir_rel_mlp_hidden=((8, 16),) * 3,
        caps=_small_caps(),
    )
    kw.update(overrides)
    return FSDConfig(**kw)
