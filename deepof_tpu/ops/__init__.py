"""JAX/XLA kernel library for deepof_tpu.

All per-frame math in the framework flows through these jittable, vmappable
pure functions over batched keypoint tensors. This module replaces the
reference's 23 numba JIT kernels plus its pandas per-video loops
(see deepof/utils.py in mlfpm/deepof) with fused XLA programs.
"""

from deepof_tpu.ops.interp import (
    ffill_indices,
    linear_interpolate_limit,
    nearest_valid_distances,
)
from deepof_tpu.ops.smoothing import (
    binary_moving_median,
    moving_average,
    savgol_edges_host,
    savgol_smooth,
)
from deepof_tpu.ops.outliers import mask_outliers, remove_outliers
from deepof_tpu.ops.kinematics import (
    all_pair_indices,
    bridge_angles,
    pairwise_distances,
    polygon_areas,
    rolling_speed,
    to_polar,
)
from deepof_tpu.ops.alignment import align_trajectories, rotate2d
from deepof_tpu.ops.imputation import (
    enforce_skeleton_constraints,
    estimate_skeleton_constraints,
    iterative_ridge_impute,
    kalman_rts_smooth,
)
from deepof_tpu.ops.geometry import (
    point_in_polygon,
    point_to_polygon_distance,
)
from deepof_tpu.ops.windows import rolling_windows, sliding_window_indices
from deepof_tpu.ops.bouts import (
    extend_behaviors,
    filter_short_true_segments,
    multi_step_paired_smoothing,
)
from deepof_tpu.ops.bursts import kleinberg, smooth_boolean_array

__all__ = [
    "ffill_indices",
    "linear_interpolate_limit",
    "nearest_valid_distances",
    "binary_moving_median",
    "moving_average",
    "savgol_edges_host",
    "savgol_smooth",
    "mask_outliers",
    "remove_outliers",
    "all_pair_indices",
    "bridge_angles",
    "pairwise_distances",
    "polygon_areas",
    "rolling_speed",
    "to_polar",
    "align_trajectories",
    "rotate2d",
    "enforce_skeleton_constraints",
    "estimate_skeleton_constraints",
    "iterative_ridge_impute",
    "kalman_rts_smooth",
    "point_in_polygon",
    "point_to_polygon_distance",
    "rolling_windows",
    "sliding_window_indices",
    "extend_behaviors",
    "filter_short_true_segments",
    "multi_step_paired_smoothing",
    "kleinberg",
    "smooth_boolean_array",
]
