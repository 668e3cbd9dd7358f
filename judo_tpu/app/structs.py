"""Inter-process message structs (reference: judo/app/structs.py:11-84).

These dataclasses are the cross-process contract between the sim loop, the
controller loop, and the visualizer. They stay plain numpy so the app shell
and GUI port over unchanged; only the solver is on-device.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum, auto
from typing import Any, Literal

import numpy as np
from scipy.interpolate import interp1d


class EventType(Enum):
    START_SIMULATION = auto()
    PAUSE_SIMULATION = auto()
    START_CONTROLLER = auto()
    PAUSE_CONTROLLER = auto()
    CHANGE_TASK = auto()
    CHANGE_CONTROLLER = auto()


@dataclass
class JudoEvent:
    event: EventType
    value: str | None = None


@dataclass
class MujocoState:
    """Simulation state snapshot published to controller + visualizer."""

    time: float
    qpos: np.ndarray
    qvel: np.ndarray
    xpos: np.ndarray
    xquat: np.ndarray
    mocap_pos: np.ndarray
    mocap_quat: np.ndarray
    sim_metadata: dict[str, Any] = field(default_factory=dict)


KindType = Literal["zero", "linear", "cubic"]


@dataclass
class SplineData:
    """(possibly batched) spline knots; ``spline()`` builds the evaluator."""

    t: np.ndarray
    x: np.ndarray
    kind: KindType = "zero"
    extrapolate: bool = True

    def spline(self) -> interp1d:
        fill_value = (self.x[..., 0, :], self.x[..., -1, :])
        return interp1d(
            self.t,
            self.x,
            kind=self.kind,
            axis=-2,
            copy=False,
            fill_value=fill_value,  # type: ignore[arg-type]
            bounds_error=not self.extrapolate,
        )
