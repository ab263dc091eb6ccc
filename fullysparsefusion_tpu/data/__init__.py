from .pipelines import (
    TransformParams,
    sample_transform_params,
    apply_points_transform,
    apply_boxes_transform,
    save_noaug_channels,
    filter_points_range,
    filter_boxes_range,
    normalize_intensity,
    shuffle_points,
    collate_scene,
)
from .cbgs import class_balanced_indices
