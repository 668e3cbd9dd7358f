"""Custom-optimizer registration demo (reference: judo/examples/example_optimizer.py).

Optimizers are pure sample/update pytree transforms, so a user optimizer is a
subclass overriding ``sample``/``update`` (or just the config). The new config
fields ride through ``Optimizer.params()`` into the jitted solve.
"""

from __future__ import annotations

from dataclasses import dataclass

from judo_tpu.optimizers.cem import CrossEntropyMethod, CrossEntropyMethodConfig


@dataclass
class MyCrossEntropyMethodConfig(CrossEntropyMethodConfig):
    """CEM config with one extra user parameter."""

    my_custom_param: int = 42


class MyCrossEntropyMethod(CrossEntropyMethod):
    """CEM variant demonstrating subclass registration."""
