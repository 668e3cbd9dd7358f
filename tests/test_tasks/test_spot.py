"""Spot task tests (reference: tests/test_spot_tasks.py + tests/test_tasks/test_spot.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from judo_tpu.tasks.spot import spot_constants as sc
from judo_tpu.tasks.spot.policy import SpotPolicy, build_observation, control_from_policy
from judo_tpu.tasks.spot.spot_base import SpotBase
from judo_tpu.tasks.spot.spot_navigate import SpotNavigate


@pytest.fixture(scope="module")
def policy():
    return SpotPolicy.load(dtype=jnp.float64)


def test_permutations_are_inverse():
    v = np.arange(19)
    orbit = v[sc.MUJOCO_TO_ORBIT]
    back = orbit[np.argsort(sc.MUJOCO_TO_ORBIT)]
    np.testing.assert_array_equal(back, v)
    # legs 12
    legs = np.arange(12)
    np.testing.assert_array_equal(legs[sc.ORBIT_TO_MUJOCO_LEGS][np.argsort(sc.ORBIT_TO_MUJOCO_LEGS)], legs)
    # arm joints map to orbit slots 0,5,10,15,16,17,18 (interleaved ordering)
    arm_orbit_slots = [np.where(sc.MUJOCO_TO_ORBIT == 12 + k)[0][0] for k in range(7)]
    assert arm_orbit_slots == [0, 5, 10, 15, 16, 17, 18]


def test_observation_layout(policy):
    qpos = jnp.zeros(26).at[3].set(1.0)  # identity quat
    qvel = jnp.arange(25, dtype=jnp.float64) * 0.1
    cmd = jnp.arange(25, dtype=jnp.float64)
    pout = jnp.full(12, 7.0)
    obs = build_observation(policy, qpos, qvel, cmd, pout)
    assert obs.shape == (84,)
    np.testing.assert_allclose(np.asarray(obs[0:3]), np.asarray(qvel[0:3]))  # identity rotation
    np.testing.assert_allclose(np.asarray(obs[3:6]), np.asarray(qvel[3:6]))
    np.testing.assert_allclose(np.asarray(obs[6:9]), [0, 0, -1])  # gravity, level base
    np.testing.assert_allclose(np.asarray(obs[9:12]), np.asarray(cmd[0:3]))
    np.testing.assert_allclose(np.asarray(obs[12:19]), np.asarray(cmd[3:10]))
    np.testing.assert_allclose(np.asarray(obs[19:31]), np.asarray(cmd[10:22]))
    np.testing.assert_allclose(np.asarray(obs[31:34]), np.asarray(cmd[22:25]))
    np.testing.assert_allclose(np.asarray(obs[72:84]), 7.0)


def test_control_mapping_leg_override(policy):
    pout = jnp.zeros(12)
    cmd = jnp.zeros(25)
    ctrl = np.asarray(control_from_policy(policy, pout, cmd))
    # zero policy output -> legs at default RL pose, arm = cmd arm (zeros)
    np.testing.assert_allclose(ctrl[:12], sc.LEGS_STANDING_POS_RL, atol=1e-6)
    # FL override: nonzero leg cmd for FL replaces its 3 ctrl entries
    cmd2 = jnp.zeros(25).at[10:13].set(jnp.asarray([0.3, 0.6, -1.2]))
    ctrl2 = np.asarray(control_from_policy(policy, pout, cmd2))
    np.testing.assert_allclose(ctrl2[0:3], [0.3, 0.6, -1.2], atol=1e-6)
    np.testing.assert_allclose(ctrl2[3:12], sc.LEGS_STANDING_POS_RL[3:], atol=1e-6)


@pytest.mark.parametrize(
    "kwargs,expected_nu",
    [
        (dict(use_arm=False), 3),
        (dict(use_arm=True), 10),
        (dict(use_arm=True, use_gripper=True), 11),
        (dict(use_arm=False, use_legs=True), 10),
        (dict(use_arm=True, use_gripper=True, use_legs=True, use_torso=True), 21),
    ],
)
def test_spot_base_nu(kwargs, expected_nu):
    np.random.seed(0)
    task = SpotBase(**kwargs)
    assert task.nu == expected_nu
    assert task.actuator_ctrlrange.shape == (expected_nu, 2)
    assert (task.actuator_ctrlrange[:, 0] <= task.actuator_ctrlrange[:, 1]).all()
    # compact -> 25-dim mapping
    ctrl = jnp.asarray(np.random.uniform(-0.2, 0.2, (4, 5, expected_nu)))
    out = task.task_to_sim_ctrl(ctrl)
    assert out.shape == (4, 5, 25)
    assert bool(jnp.isfinite(out).all())


def test_spot_navigate_reward_shape():
    np.random.seed(0)
    task = SpotNavigate()
    R, T = 6, 4
    rng = np.random.default_rng(0)
    states = jnp.asarray(rng.standard_normal((R, T, task.model.nq + task.model.nv)))
    sensors = jnp.asarray(rng.standard_normal((R, T, task.model.nsensordata)))
    controls = jnp.asarray(rng.standard_normal((R, T, task.nu)))
    r = task.reward(states, sensors, controls, task.task_params(jnp.float64), {})
    assert r.shape == (R,)
    assert bool(jnp.isfinite(r).all())


def test_spot_reset_pose_finite():
    np.random.seed(0)
    task = SpotNavigate()
    assert task.reset_pose.shape == (26,)
    assert np.isfinite(task.reset_pose).all()
    assert task.uses_locomotion_policy


def test_gripper_selection_mask():
    np.random.seed(0)
    task = SpotBase(use_arm=True, use_gripper=True)
    ctrl = np.zeros(task.nu)
    ctrl[9] = sc.GRIPPER_OPEN_POS  # commanded open
    ctrl[10] = -0.5  # selection < 0 -> forced closed
    out = np.asarray(task.task_to_sim_ctrl(jnp.asarray(ctrl)))
    assert out[9] == pytest.approx(sc.GRIPPER_CLOSED_POS)
    ctrl[10] = 0.5  # selection > 0 -> open command passes
    out = np.asarray(task.task_to_sim_ctrl(jnp.asarray(ctrl)))
    assert out[9] == pytest.approx(sc.GRIPPER_OPEN_POS)


@pytest.mark.parametrize(
    "task_cls,expected_nu",
    [
        ("SpotNavigate", 3),
        ("SpotBoxPush", 10),
        ("SpotTireRoll", 11),
        ("SpotTireUpright", 17),
    ],
)
def test_spot_task_family(task_cls, expected_nu):
    """Parity with tests/test_spot_tasks.py:26-117: nu per feature combo,
    reward shape/finiteness on random inputs, reset pose finiteness."""
    import judo_tpu.tasks as tasks_mod

    np.random.seed(0)
    task = getattr(tasks_mod, task_cls)()
    assert task.nu == expected_nu
    R, T = 5, 3
    rng = np.random.default_rng(1)
    states = jnp.asarray(rng.standard_normal((R, T, task.model.nq + task.model.nv)))
    sensors = jnp.asarray(rng.standard_normal((R, T, task.model.nsensordata)))
    controls = jnp.asarray(rng.standard_normal((R, T, task.nu)))
    r = task.reward(states, sensors, controls, task.task_params(jnp.float64), {})
    assert r.shape == (R,)
    assert bool(jnp.isfinite(r).all())
    pose = task.reset_pose
    assert pose.shape == (task.model.nq,)
    assert np.isfinite(pose).all()


def test_tire_upright_success_predicate():
    np.random.seed(0)
    from judo_tpu.tasks import SpotTireUpright

    task = SpotTireUpright()
    # reset leaves the tire flat: y-axis vertical -> not successful
    assert not task.success()
