"""Custom-task registration demo (reference: judo/examples/example_task.py).

A user task is just a subclass: inherit the dynamics/reward of an existing
task, extend its config dataclass with new (GUI-reflected) parameters, and
register it under a new name. The extra parameter automatically appears in
the viser GUI and flows into the jitted solve through ``task_params`` with
zero recompilation.
"""

from __future__ import annotations

from dataclasses import dataclass

from judo_tpu.tasks.cylinder_push import CylinderPush, CylinderPushConfig


@dataclass
class MyCylinderPushConfig(CylinderPushConfig):
    """Cylinder-push config with one extra user parameter."""

    my_custom_param: int = 42


class MyCylinderPush(CylinderPush):
    """Cylinder-push variant demonstrating subclass registration."""

    name: str = "my_cylinder_push"
    config_t: type[MyCylinderPushConfig] = MyCylinderPushConfig
