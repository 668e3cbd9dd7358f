"""Per-task controller defaults (values mirror judo/controller/overrides.py:7-103)."""

from __future__ import annotations

from judo_tpu.config import set_config_overrides
from judo_tpu.controller.controller import ControllerConfig

_SPOT_TASK_NAMES = (
    "spot_base",
    "spot_box_push",
    "spot_navigate",
    "spot_tire_roll",
    "spot_tire_upright",
)


def set_default_controller_overrides() -> None:
    for name in ("cartpole", "cylinder_push"):
        set_config_overrides(name, ControllerConfig, {"horizon": 1.0, "spline_order": "zero"})
    for name in ("leap_cube", "leap_cube_down", "caltech_leap_cube"):
        set_config_overrides(
            name, ControllerConfig, {"horizon": 1.0, "spline_order": "cubic", "max_num_traces": 1}
        )
    for name in _SPOT_TASK_NAMES:
        set_config_overrides(name, ControllerConfig, {"horizon": 2.0})
    set_config_overrides(
        "fr3_pick",
        ControllerConfig,
        {"horizon": 1.0, "spline_order": "linear", "max_num_traces": 3, "control_freq": 20.0},
    )
