"""Simulation base (reference: judo/simulation/base.py:13-59)."""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np

from judo_tpu.tasks import Task, get_registered_tasks


class Simulation(ABC):
    """The 'real' physics process the controller acts on."""

    def __init__(self, task: Task) -> None:
        self.task = task
        self.paused = False

    def set_task(self, task_name: str) -> None:
        """Switch tasks by registry name."""
        entry = get_registered_tasks().get(task_name)
        assert entry is not None, f"Task {task_name} not found in task registry."
        task_cls, _ = entry
        self.set_task_instance(task_cls())

    def set_task_instance(self, task: Task) -> None:
        """Switch to an already-constructed task (avoids double construction
        when the caller needed the instance to pick a backend)."""
        self.task = task

    def pause(self, paused: bool | None = None) -> None:
        self.paused = (not self.paused) if paused is None else paused

    @abstractmethod
    def step(self, command: np.ndarray) -> None:
        """Advance the simulation one step under the given task-space command."""

    @property
    @abstractmethod
    def timestep(self) -> float:
        """Wall-clock pacing interval for the sim loop."""
