"""Task registry (reference parity: judo/tasks/__init__.py:25-47)."""

from typing import Type

from judo_tpu.tasks.base import Task, TaskConfig
from judo_tpu.tasks.cartpole import Cartpole, CartpoleConfig
from judo_tpu.tasks.cylinder_push import CylinderPush, CylinderPushConfig
from judo_tpu.tasks.fr3_pick import FR3Pick, FR3PickConfig
from judo_tpu.tasks.caltech_leap_cube import CaltechLeapCube, CaltechLeapCubeConfig
from judo_tpu.tasks.leap_cube import LeapCube, LeapCubeConfig
from judo_tpu.tasks.leap_cube_down import LeapCubeDown, LeapCubeDownConfig
from judo_tpu.tasks.spot.spot_base import SpotBase, SpotBaseConfig
from judo_tpu.tasks.spot.spot_box_push import SpotBoxPush, SpotBoxPushConfig
from judo_tpu.tasks.spot.spot_navigate import SpotNavigate, SpotNavigateConfig
from judo_tpu.tasks.spot.spot_tire_roll import SpotTireRoll, SpotTireRollConfig
from judo_tpu.tasks.spot.spot_tire_upright import SpotTireUpright, SpotTireUprightConfig

_registered_tasks: dict[str, tuple[Type[Task], Type[TaskConfig]]] = {}


def register_task(name: str, task_type: Type[Task], task_config_type: Type[TaskConfig] | None = None) -> None:
    if task_config_type is None:
        task_config_type = task_type.config_t
    _registered_tasks[name] = (task_type, task_config_type)


def get_registered_tasks() -> dict[str, tuple[Type[Task], Type[TaskConfig]]]:
    return _registered_tasks


for _cls in (Cartpole, CylinderPush, FR3Pick, LeapCube, LeapCubeDown, CaltechLeapCube, SpotNavigate, SpotBoxPush, SpotTireRoll, SpotTireUpright):
    register_task(_cls.name, _cls)

__all__ = [
    "Cartpole",
    "CartpoleConfig",
    "FR3Pick",
    "FR3PickConfig",
    "CylinderPush",
    "CylinderPushConfig",
    "CaltechLeapCube",
    "CaltechLeapCubeConfig",
    "LeapCube",
    "LeapCubeConfig",
    "LeapCubeDown",
    "LeapCubeDownConfig",
    "SpotBase",
    "SpotBaseConfig",
    "SpotBoxPush",
    "SpotBoxPushConfig",
    "SpotNavigate",
    "SpotNavigateConfig",
    "SpotTireRoll",
    "SpotTireRollConfig",
    "SpotTireUpright",
    "SpotTireUprightConfig",
    "Task",
    "TaskConfig",
    "get_registered_tasks",
    "register_task",
]
