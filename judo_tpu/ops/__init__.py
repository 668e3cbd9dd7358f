"""Core JAX ops: quaternion math, cost kernels, spline interpolation."""

from judo_tpu.ops.costs import quadratic_norm, smooth_l1_norm
from judo_tpu.ops.math import (
    axis_angle_diff,
    quat_diff,
    quat_diff_so3,
    quat_inv,
    quat_mul,
    quat_rotate,
    quat_vel,
    safe_normalize_axis,
)
from judo_tpu.ops.splines import eval_spline, interp_linear

__all__ = [
    "axis_angle_diff",
    "eval_spline",
    "interp_linear",
    "quadratic_norm",
    "quat_diff",
    "quat_diff_so3",
    "quat_inv",
    "quat_mul",
    "quat_rotate",
    "quat_vel",
    "safe_normalize_axis",
    "smooth_l1_norm",
]
