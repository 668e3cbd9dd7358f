"""LEAP cube palm-down variant (reference: judo/tasks/leap_cube_down.py)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from judo_tpu.gui import slider
from judo_tpu.models.leap import leap_cube_xml_path
from judo_tpu.tasks.leap_cube import LeapCube, LeapCubeConfig

QPOS_HOME = np.array(
    [
        -0.04, -0.035, -0.065, 1.0, 0.0, 0.0, 0.0,  # cube below the palm
        1.0, 0.0, 0.8, 0.8,  # index
        1.0, 0.0, 0.8, 0.8,  # middle
        1.0, 0.0, 0.8, 0.8,  # ring
        1.0, 1.0, 0.4, 0.9,  # thumb
    ]
)  # fmt: skip


@slider("w_pos", 0.0, 200.0)
@slider("w_rot", 0.0, 1.0)
@dataclass
class LeapCubeDownConfig(LeapCubeConfig):
    w_rot: float = 0.05


class LeapCubeDown(LeapCube):
    """Cube held underneath the downward-facing palm."""

    name: str = "leap_cube_down"
    config_t: type[LeapCubeDownConfig] = LeapCubeDownConfig

    def __init__(self, model_path: str | None = None, sim_model_path: str | None = None) -> None:
        super().__init__(
            model_path=model_path or leap_cube_xml_path("leap_cube_down"),
            sim_model_path=sim_model_path,
        )
        self.goal_pos = np.array([-0.04, -0.035, -0.065])
        self.goal_quat = np.array([1.0, 0.0, 0.0, 0.0])
        self.qpos_home = QPOS_HOME
        self.reset_command = QPOS_HOME[7:].copy()
        self.reset()
