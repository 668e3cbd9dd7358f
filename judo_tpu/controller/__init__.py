from judo_tpu.controller.controller import (
    Controller,
    ControllerConfig,
    SolveOutputs,
    SolverState,
    make_controller,
)
from judo_tpu.controller.overrides import set_default_controller_overrides

set_default_controller_overrides()

__all__ = [
    "Controller",
    "ControllerConfig",
    "SolveOutputs",
    "SolverState",
    "make_controller",
]
