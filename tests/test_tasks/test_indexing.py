"""Task index-helper tests against an inline MJCF (reference:
tests/test_tasks/test_indexing.py:12-57 — same contract, fresh content)."""

from __future__ import annotations

import numpy as np

from judo_tpu.tasks.base import Task, TaskConfig


class IndexTask(Task[TaskConfig]):
    name = "index_test_task"
    config_t = TaskConfig

    def reward(self, states, sensors, controls, params, metadata):
        import jax.numpy as jnp

        return jnp.zeros(states.shape[0], states.dtype)

    def reset(self) -> None:
        self.data.qpos[:] = 0.0
        self.data.qvel[:] = 0.0


def test_sensor_start_index(task_text_xml_path):
    task = IndexTask(model_path=task_text_xml_path)
    assert task.get_sensor_start_index("trace_site") == 0


def test_joint_indices(task_text_xml_path):
    task = IndexTask(model_path=task_text_xml_path)
    # three slide joints: qpos addresses 0,1,2; qvel offset by nq=3
    assert task.get_joint_position_start_index("jx") == 0
    assert task.get_joint_position_start_index("jy") == 1
    assert task.get_joint_position_start_index("jz") == 2
    assert task.get_joint_velocity_start_index("jx") == 3
    assert task.get_joint_velocity_start_index("jy") == 4
    assert task.get_joint_velocity_start_index("jz") == 5


def test_index_helpers_consistent_with_state_layout(task_text_xml_path):
    """Writing through the helper indices must land in the right slot of the
    concatenated (qpos, qvel) planner state vector."""
    task = IndexTask(model_path=task_text_xml_path)
    state = np.zeros(task.model.nq + task.model.nv)
    qi = task.get_joint_position_start_index("jy")
    vi = task.get_joint_velocity_start_index("jy")
    state[qi] = 0.25
    state[vi] = -0.5
    task.data.qpos[:] = state[: task.model.nq]
    task.data.qvel[:] = state[task.model.nq :]
    assert task.data.qpos[1] == 0.25
    assert task.data.qvel[1] == -0.5
