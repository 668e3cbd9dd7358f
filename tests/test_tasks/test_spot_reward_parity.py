"""Spot navigate / box_push / tire_roll reward parity vs numpy
transcriptions of the reference (judo/tasks/spot/*.py in /root/reference),
completing the fidelity coverage started by the tire_upright parity test.
"""

import numpy as np
import pytest

from judo_tpu.tasks.spot.spot_box_push import SpotBoxPush
from judo_tpu.tasks.spot.spot_navigate import SpotNavigate
from judo_tpu.tasks.spot.spot_tire_roll import SpotTireRoll

Z_AXIS = np.array([0.0, 0.0, 1.0])


def _random_batch(task, seed=0, R=5, T=7):
    rng = np.random.default_rng(seed)
    nq, nv, nu = task.model.nq, task.model.nv, task.nu
    states = rng.standard_normal((R, T, nq + nv))
    states[..., task.body_pose_idx + 2] = rng.uniform(0.1, 0.7, (R, T))
    sensors = rng.standard_normal((R, T, task.model.nsensordata))
    controls = rng.standard_normal((R, T, nu))
    return states, sensors, controls


def _ours(task, states, sensors, controls):
    return np.asarray(
        task.reward(
            states.astype(np.float32), sensors.astype(np.float32),
            controls.astype(np.float32), task.task_params(), {},
        )
    )


def test_navigate_reward_parity():
    task = SpotNavigate()
    states, sensors, controls = _random_batch(task)
    cfg = task.config
    qpos = states[..., : task.model.nq]
    body_h = qpos[..., task.body_pose_idx + 2]
    body_pos = qpos[..., task.body_pose_idx : task.body_pose_idx + 3]
    ref = (
        -cfg.fall_penalty * (body_h <= cfg.spot_fallen_threshold).any(-1)
        - cfg.w_goal * np.linalg.norm(body_pos - cfg.goal_position[None, None], axis=-1).mean(-1)
        - cfg.w_controls * np.linalg.norm(controls, axis=-1).mean(-1)
    )
    np.testing.assert_allclose(_ours(task, states, sensors, controls), ref, rtol=2e-4, atol=2e-3)


def test_box_push_reward_parity():
    task = SpotBoxPush()
    states, sensors, controls = _random_batch(task, seed=1)
    cfg = task.config
    qpos = states[..., : task.model.nq]
    body_h = qpos[..., task.body_pose_idx + 2]
    body_pos = qpos[..., task.body_pose_idx : task.body_pose_idx + 3]
    obj_pos = qpos[..., task.object_pose_idx : task.object_pose_idx + 3]
    obj_y = sensors[..., task.object_y_axis_idx : task.object_y_axis_idx + 3]
    grip = sensors[..., task.gripper_pos_idx : task.gripper_pos_idx + 3]
    ref = (
        -cfg.fall_penalty * (body_h <= cfg.spot_fallen_threshold).any(-1)
        - cfg.w_goal * np.linalg.norm(obj_pos - cfg.goal_position[None, None], axis=-1).mean(-1)
        - cfg.w_orientation * np.abs(np.dot(obj_y, Z_AXIS) > cfg.orientation_threshold).sum(-1)
        # note: the reference ADDS w_torso_proximity * distance (a standoff
        # incentive with a positive sign, spot_box_push.py:87)
        + cfg.w_torso_proximity * np.linalg.norm(body_pos - obj_pos, axis=-1).mean(-1)
        - cfg.w_gripper_proximity * np.linalg.norm(grip - obj_pos, axis=-1).mean(-1)
        - cfg.w_controls * np.linalg.norm(controls, axis=-1).mean(-1)
    )
    np.testing.assert_allclose(_ours(task, states, sensors, controls), ref, rtol=2e-4, atol=2e-3)


def test_tire_roll_reward_parity():
    task = SpotTireRoll()
    states, sensors, controls = _random_batch(task, seed=2)
    cfg = task.config
    nq = task.model.nq
    qpos, qvel = states[..., :nq], states[..., nq:]
    body_h = qpos[..., task.body_pose_idx + 2]
    body_pos = qpos[..., task.body_pose_idx : task.body_pose_idx + 3]
    obj_pos = qpos[..., task.object_pose_idx : task.object_pose_idx + 3]
    lin = qvel[..., task.object_vel_idx : task.object_vel_idx + 3]
    ang = qvel[..., task.object_vel_idx + 3 : task.object_vel_idx + 6]
    grip = sensors[..., task.gripper_pos_idx : task.gripper_pos_idx + 3]
    obj_y = sensors[..., task.object_y_axis_idx : task.object_y_axis_idx + 3]

    to_goal = cfg.goal_position - obj_pos
    to_goal_dir = to_goal / (1e-2 + np.linalg.norm(to_goal, axis=-1, keepdims=True))
    grip_goal = obj_pos - cfg.gripper_goal_offset * to_goal_dir
    grip_goal[..., 2] = cfg.gripper_goal_altitude
    torso_goal = obj_pos - cfg.torso_goal_offset * to_goal_dir

    ref = (
        -cfg.fall_penalty * (body_h <= cfg.spot_fallen_threshold).any(-1)
        - cfg.fall_penalty * np.abs(np.dot(obj_y, Z_AXIS) > cfg.tire_fallen_threshold).sum(-1)
        - cfg.w_goal * np.linalg.norm(obj_pos - cfg.goal_position, axis=-1).mean(-1)
        - cfg.w_torso_proximity * np.linalg.norm(body_pos - torso_goal, axis=-1).mean(-1)
        - cfg.w_gripper_proximity * np.linalg.norm(grip_goal - grip, axis=-1).mean(-1)
        - cfg.w_controls * np.linalg.norm(controls, axis=-1).mean(-1)
        - cfg.w_tire_linear_velocity * np.linalg.norm(lin, axis=-1).mean(-1)
        - cfg.w_tire_angular_velocity * np.linalg.norm(ang, axis=-1).mean(-1)
    )
    np.testing.assert_allclose(_ours(task, states, sensors, controls), ref, rtol=2e-4, atol=2e-3)
