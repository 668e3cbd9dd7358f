"""Planner/sim model split for leap_cube (reference: judo/tasks/leap_cube.py:14-15).

The planner rolls out leap_cube.xml (dt=0.01); the plant integrates
leap_cube_sim.xml (dt=0.005), so closed-loop behavior includes genuine
planner-vs-plant model error rather than the planner grading its own model.
"""

import numpy as np
import pytest

from judo_tpu.tasks import get_registered_tasks


@pytest.fixture(scope="module")
def task():
    task_cls, _ = get_registered_tasks()["leap_cube"]
    return task_cls()


def test_sim_model_is_higher_fidelity(task):
    assert task.sim_model is not task.model
    assert float(task.model.opt.timestep) == pytest.approx(0.01)
    # 5x finer than the planner — the reference's fidelity ratio
    # (leap_components/params_and_default_sim.xml: 0.002 vs 0.01)
    assert float(task.sim_model.opt.timestep) == pytest.approx(0.002)
    # same articulation: state/ctrl layouts must line up for the app loop
    assert task.sim_model.nq == task.model.nq
    assert task.sim_model.nv == task.model.nv
    assert task.sim_model.nu == task.model.nu


def test_variants_keep_single_model(task):
    """Only the flagship task ships the split by default; explicit paths win."""
    task_cls, _ = get_registered_tasks()["leap_cube_down"]
    down = task_cls()
    assert down.sim_model is down.model


def test_closed_loop_planner_on_sim_plant(task):
    """A few closed-loop control steps: plan on the planner model, integrate
    the plant with MJSimulation on the sim model; the cube must stay held
    (no drop-reset trigger) and states must stay finite."""
    import jax

    from judo_tpu.controller import Controller, ControllerConfig
    from judo_tpu.optimizers import MPPI, MPPIConfig
    from judo_tpu.simulation.mj_simulation import MJSimulation

    np.random.seed(0)
    opt = MPPI(MPPIConfig(num_rollouts=8, num_nodes=4, sigma=0.1), task.nu)
    c = Controller(ControllerConfig(horizon=0.1, spline_order="zero"), task, opt)
    sim = MJSimulation(task)

    assert sim.model is task.sim_model
    for _ in range(3):
        c.current_state = np.concatenate([sim.data.qpos, sim.data.qvel])
        c.time = float(sim.data.time)
        c.update_action()
        jax.block_until_ready(c.last_outputs.rewards)
        for _ in range(4):  # 4 plant substeps per plan (0.02 s at dt 0.005)
            sim.step(c.action(float(sim.data.time)))
    cube_z = sim.data.qpos[2]
    assert np.isfinite(sim.data.qpos).all()
    assert cube_z > -0.3, "cube dropped in closed loop"
