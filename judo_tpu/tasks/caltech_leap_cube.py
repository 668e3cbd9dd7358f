"""Caltech-mount LEAP cube variant (reference: judo/tasks/caltech_leap_cube.py)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from judo_tpu.gui import slider
from judo_tpu.models.leap import leap_cube_xml_path
from judo_tpu.tasks.leap_cube import LeapCube, LeapCubeConfig

QPOS_HOME = np.array(
    [
        0.11, 0.005, 0.04, 1.0, 0.0, 0.0, 0.0,  # cube
        0.5, -0.75, 0.75, 0.25,  # index
        0.5, 0.0, 0.75, 0.25,  # middle
        0.5, 0.75, 0.75, 0.25,  # ring
        0.65, 0.9, 0.75, 0.6,  # thumb
    ]
)  # fmt: skip


@slider("w_pos", 0.0, 200.0)
@slider("w_rot", 0.0, 1.0)
@dataclass
class CaltechLeapCubeConfig(LeapCubeConfig):
    pass


class CaltechLeapCube(LeapCube):
    """LEAP cube rotation on the Caltech hand mount."""

    name: str = "caltech_leap_cube"
    config_t: type[CaltechLeapCubeConfig] = CaltechLeapCubeConfig

    def __init__(self, model_path: str | None = None, sim_model_path: str | None = None) -> None:
        super().__init__(
            model_path=model_path or leap_cube_xml_path("caltech_leap_cube"),
            sim_model_path=sim_model_path,
        )
        self.goal_pos = np.array([0.11, 0.005, 0.03])
        self.goal_quat = np.array([1.0, 0.0, 0.0, 0.0])
        self.qpos_home = QPOS_HOME
        self.reset_command = QPOS_HOME[7:].copy()
        self.reset()
