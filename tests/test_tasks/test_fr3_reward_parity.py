"""FR3 pick reward parity vs the reference (judo/tasks/fr3_pick.py:225-311).

The reference reward is transcribed independently in numpy below (same
pattern as test_spot_golden.py) and evaluated against our jitted reward on
random state/sensor batches in every phase, so a dropped per-phase term or a
mis-wired sensor index cannot pass. The phase machine itself is checked
against the reference's ACTUAL thresholds (z > 0.021 / goal tube; the
sensor-distance variant in the reference is commented out there as buggy,
fr3_pick.py:196-222).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from judo_tpu.tasks.fr3_pick import FR3Pick, Phase, QPOS_HOME


@pytest.fixture(scope="module")
def task():
    return FR3Pick()


def ref_reward(task, states, sensors, phase, cfg):
    """Reference reward, transcribed from judo/tasks/fr3_pick.py:225-311."""
    lf = sensors[:, :, task.left_finger_table_adr]
    rf = sensors[:, :, task.right_finger_table_adr]
    obj_table = sensors[:, :, task.obj_table_adr]
    grasp = sensors[..., task.grasp_site_adr : task.grasp_site_adr + 3]
    ee_z = sensors[..., task.ee_z_adr : task.ee_z_adr + 3]

    obj_pos = states[..., task.obj_pos_slice]
    arm_pos = states[..., task.arm_pos_slice]
    xy = states[..., task.obj_pos_adr : task.obj_pos_adr + 2]
    z_obj = states[..., task.obj_pos_adr + 2]
    nq, nv = task.model.nq, task.model.nv
    qvel_norm = np.linalg.norm(states[..., nq : nq + nv], axis=-1)
    gripper = arm_pos[..., -1]

    grasp_dist = ((grasp - obj_pos) ** 2).sum(-1)
    pick_h = (z_obj - cfg.pick_height) ** 2
    goal_d = np.linalg.norm(xy - cfg.goal_pos, axis=-1)
    home_d = np.linalg.norm(arm_pos - QPOS_HOME[task.arm_pos_slice], axis=-1)

    if phase == Phase.LIFT:
        r = -(cfg.lift_weights.w_lift_close * grasp_dist + cfg.lift_weights.w_lift_height * pick_h).sum(-1)
    elif phase == Phase.MOVE:
        r = -(cfg.move_weights.w_move_goal * goal_d + cfg.move_weights.w_move_close * grasp_dist).sum(-1)
    elif phase == Phase.PLACE:
        r = -(cfg.place_weights.w_place_table * obj_table + cfg.place_weights.w_place_goal * goal_d).sum(-1)
    else:
        r = -home_d.sum(-1)

    touching = (lf <= 0) | (rf <= 0)
    r_up = -np.linalg.norm(ee_z - np.array([[[0.0, 0.0, -1.0]]]), axis=-1).sum(-1)
    r_coll = (1 - touching).sum(-1)
    decay = np.linspace(1.0, 0.0, states.shape[1])
    r_qvel = -(decay * qvel_norm).sum(-1)
    r_open = -((gripper - 0.04) ** 2).sum(-1)
    gw = cfg.global_weights
    return r + gw.w_upright * r_up + gw.w_coll * r_coll + gw.w_qvel * r_qvel + gw.w_open * r_open


@pytest.mark.parametrize("phase", list(Phase))
def test_reward_matches_reference_all_phases(task, phase):
    rng = np.random.default_rng(phase.value)
    R, T = 5, 7
    nq, nv, ns = task.model.nq, task.model.nv, task.model.nsensordata
    states = rng.standard_normal((R, T, nq + nv))
    sensors = rng.standard_normal((R, T, ns))
    controls = rng.standard_normal((R, T, task.nu))

    expected = ref_reward(task, states, sensors, phase, task.config)
    params = task.task_params(jnp.float64)
    meta = {"phase": jnp.asarray(float(phase.value))}
    ours = np.asarray(
        task.reward(jnp.asarray(states), jnp.asarray(sensors), jnp.asarray(controls), params, meta)
    )
    np.testing.assert_allclose(ours, expected, rtol=1e-9, atol=1e-9)


def test_phase_machine_matches_reference_thresholds(task):
    """pre_rollout must reproduce fr3_pick.py:191-223's actual logic."""
    nq, nv = task.model.nq, task.model.nv
    goal = np.asarray(task.config.goal_pos)

    def state(obj_xyz):
        s = np.zeros(nq + nv)
        s[:nq] = QPOS_HOME
        s[task.obj_pos_adr : task.obj_pos_adr + 3] = obj_xyz
        return s

    cases = [
        ((0.7, 0.0, 0.02), Phase.LIFT),  # on table, not in goal
        ((0.7, 0.0, 0.30), Phase.MOVE),  # in air, not in goal
        ((goal[0], goal[1], 0.30), Phase.PLACE),  # in air, over goal
        ((goal[0], goal[1], 0.02), Phase.HOMING),  # on table, in goal
        # boundary: exactly at threshold z = 0.021 counts as ON the table
        ((goal[0], goal[1], 0.021), Phase.HOMING),
    ]
    for xyz, expect in cases:
        task.pre_rollout(state(xyz))
        assert task.phase == expect, (xyz, task.phase, expect)
