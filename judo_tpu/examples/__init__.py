"""Subclass-registration demos (reference: judo/examples/, SURVEY §2.11).

These show the two extension points end users reach for first: a custom task
and a custom optimizer, registered either programmatically
(``register_task`` / ``register_optimizer``) or declaratively from a YAML
launch config (``custom_tasks`` / ``custom_optimizers`` dotted paths — see
``example_configs/example.yaml``).
"""

from judo_tpu.examples.example_optimizer import MyCrossEntropyMethod, MyCrossEntropyMethodConfig
from judo_tpu.examples.example_task import MyCylinderPush, MyCylinderPushConfig

__all__ = [
    "MyCrossEntropyMethod",
    "MyCrossEntropyMethodConfig",
    "MyCylinderPush",
    "MyCylinderPushConfig",
]
