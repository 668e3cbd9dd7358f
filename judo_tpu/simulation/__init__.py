"""Simulation backend registry (reference: judo/simulation/__init__.py:7-15)."""

from judo_tpu.simulation.base import Simulation
from judo_tpu.simulation.mj_simulation import MJSimulation
from judo_tpu.simulation.jt_simulation import JTSimulation
from judo_tpu.simulation.policy_simulation import PolicySimulation

_backends = {
    "mujoco": MJSimulation,
    "mujoco_policy": PolicySimulation,
    "judo_tpu": JTSimulation,
}


def get_simulation_backend(name: str):
    if name not in _backends:
        raise ValueError(f"Unknown simulation backend '{name}'. Available: {list(_backends)}")
    return _backends[name]


def register_simulation_backend(name: str, cls) -> None:
    _backends[name] = cls


__all__ = [
    "JTSimulation",
    "MJSimulation",
    "PolicySimulation",
    "Simulation",
    "get_simulation_backend",
    "register_simulation_backend",
]
