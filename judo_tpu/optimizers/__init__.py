"""Optimizer registry (reference parity: judo/optimizers/__init__.py:19-60)."""

from typing import Type

from judo_tpu.optimizers.base import Optimizer, OptimizerConfig
from judo_tpu.optimizers.cem import CrossEntropyMethod, CrossEntropyMethodConfig
from judo_tpu.optimizers.mppi import MPPI, MPPIConfig
from judo_tpu.optimizers.overrides import set_default_optimizer_overrides
from judo_tpu.optimizers.ps import PredictiveSampling, PredictiveSamplingConfig

set_default_optimizer_overrides()

_registered_optimizers: dict[str, tuple[Type[Optimizer], Type[OptimizerConfig]]] = {
    "cem": (CrossEntropyMethod, CrossEntropyMethodConfig),
    "mppi": (MPPI, MPPIConfig),
    "ps": (PredictiveSampling, PredictiveSamplingConfig),
}


def get_registered_optimizers() -> dict[str, tuple[Type[Optimizer], Type[OptimizerConfig]]]:
    return _registered_optimizers


def register_optimizer(
    name: str,
    optimizer_type: Type[Optimizer],
    optimizer_config_type: Type[OptimizerConfig],
) -> None:
    _registered_optimizers[name] = (optimizer_type, optimizer_config_type)


__all__ = [
    "CrossEntropyMethod",
    "CrossEntropyMethodConfig",
    "MPPI",
    "MPPIConfig",
    "Optimizer",
    "OptimizerConfig",
    "PredictiveSampling",
    "PredictiveSamplingConfig",
    "get_registered_optimizers",
    "register_optimizer",
]
