from .segment import (
    INVALID_KEY,
    SegmentInfo,
    unique_segments,
    segment_sum,
    segment_mean,
    segment_max,
    segment_min,
    ingroup_indices,
    apply_segments,
)
from .voxelize import (
    voxel_coords,
    linearize_coords,
    delinearize_coords,
    voxelize_points,
    voxel_downsample,
)
