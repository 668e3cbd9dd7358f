"""Trajectory parity of the JAX physics engine vs CPU MuJoCo.

These are the engine's ground-truth tests: the same model XML is stepped by
mj_step and by judo_tpu.physics.rollout under identical controls, in float64,
and trajectories must agree.

Tolerances: smooth scenes (no contacts, or exact-manifold contacts like
sphere-plane and joint limits) agree to machine precision; the cylinder
manifold differs from MuJoCo's MPR by ~1e-3 in normal direction, giving
trajectory-level agreement ~1e-2 (the planner's rollouts are robust to far
more model error than this).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from judo_tpu.physics import make_state, put_model, rollout

CARTPOLE = """
<mujoco model="cartpole">
  <option timestep="0.01"><flag contact="disable"/></option>
  <worldbody>
    <body name="cart" pos="0 0 0">
      <joint name="joint_cart" type="slide" axis="1 0 0" damping="10" range="-1.8 1.8"/>
      <geom name="cart" type="box" size="0.2 0.15 0.1" mass="1"/>
      <site name="trace_cart" pos="0 0 0" size="0.01"/>
      <body name="pole">
        <joint name="joint_pole" type="hinge" axis="0 1 0" damping="0"/>
        <geom name="pole" type="capsule" fromto="0 0 0 0 0 1" size="0.045" mass="0.1"/>
        <site name="trace_pole" pos="0 0 1" size="0.01"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <position name="actuator_cart" joint="joint_cart" kp="100" ctrlrange="-1.8 1.8" forcerange="-10 10"/>
  </actuator>
  <sensor>
    <framepos name="trace_cart" objtype="site" objname="trace_cart"/>
    <framepos name="trace_pole" objtype="site" objname="trace_pole"/>
  </sensor>
</mujoco>
"""

SPHERE_PLANE = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1" friction="1 0.005 0.0001"/>
    <body name="ball" pos="0 0 0.3">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.1" mass="0.5" friction="1 0.005 0.0001"/>
    </body>
  </worldbody>
</mujoco>
"""

LIMIT_HIT = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <body name="slider">
      <joint name="jx" type="slide" axis="1 0 0" range="-0.2 0.2" damping="0.5"/>
      <geom type="box" size="0.1 0.1 0.1" mass="1" contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <actuator><motor joint="jx" ctrlrange="-5 5"/></actuator>
</mujoco>
"""

CYLINDER_PUSH = """
<mujoco model="cylinder_push">
  <option timestep="0.02"/>
  <worldbody>
    <body><geom mass="0" name="floor" pos="0 0 -0.25" condim="3" size="10 10 0.1" type="box"/></body>
    <body name="pusher" pos="0 0 0">
      <joint name="slider_x" damping="4" type="slide" axis="1 0 0"/>
      <joint name="slider_y" damping="4" type="slide" axis="0 1 0"/>
      <geom name="pusher" type="cylinder" size="0.25 0.1" mass="1" friction="0"/>
      <site pos="0 0 0.15" name="pusher_site"/>
    </body>
    <body name="cart" pos="0 0 0">
      <joint name="slider_cart_x" damping="4" type="slide" axis="1 0 0"/>
      <joint name="slider_cart_y" damping="4" type="slide" axis="0 1 0"/>
      <geom name="cart" type="cylinder" size="0.25 0.1" mass="1" friction="0"/>
      <site pos="0 0 0.15" name="cart_site"/>
    </body>
  </worldbody>
  <actuator>
    <position name="px" joint="slider_x" kp="10" ctrlrange="-10 10" forcerange="-1000 1000"/>
    <position name="py" joint="slider_y" kp="10" ctrlrange="-10 10" forcerange="-1000 1000"/>
  </actuator>
  <sensor>
    <framepos name="trace_pusher" objtype="site" objname="pusher_site"/>
    <framepos name="trace_cart" objtype="site" objname="cart_site"/>
  </sensor>
</mujoco>
"""

FREE_TUMBLE = """
<mujoco>
  <option timestep="0.002"><flag contact="disable"/></option>
  <worldbody>
    <body name="brick" pos="0 0 1">
      <freejoint/>
      <geom type="box" size="0.1 0.05 0.02" mass="0.3"/>
    </body>
  </worldbody>
</mujoco>
"""


def _run_pair(xml, qpos0, qvel0, T, ctrl_scale=0.5):
    mj = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(mj)
    pm = put_model(mj, dtype=jnp.float64)

    ctrl = ctrl_scale * np.sin(0.05 * np.arange(T))[:, None] * np.ones((1, mj.nu))
    d.qpos[:] = qpos0
    d.qvel[:] = qvel0
    mj_states = []
    for t in range(T):
        if mj.nu:
            d.ctrl[:] = ctrl[t]
        mujoco.mj_step(mj, d)
        mj_states.append(np.concatenate([d.qpos.copy(), d.qvel.copy()]))
    mj_states = np.array(mj_states)

    s0 = make_state(pm, qpos=qpos0, qvel=qvel0)
    out = jax.jit(lambda s, c: rollout(pm, s, c))(s0, jnp.asarray(ctrl))
    return np.asarray(out.states), mj_states


def test_cartpole_exact():
    ours, mjs = _run_pair(CARTPOLE, [0.3, 2.5], [0.1, -0.2], T=200)
    np.testing.assert_allclose(ours, mjs, atol=1e-10)


def test_free_body_tumbling_exact():
    ours, mjs = _run_pair(FREE_TUMBLE, [0, 0, 1, 1, 0, 0, 0], [0.3, -0.2, 0.5, 3.0, 2.0, 1.0], T=300)
    np.testing.assert_allclose(ours, mjs, atol=1e-9)


def test_sphere_plane_impact_friction_exact():
    # impact-step tolerance reflects the matrix-free APGD's safe (upper-bound)
    # step size: convergence is ~1e-7 at the contact switch, machine-precision
    # elsewhere
    ours, mjs = _run_pair(SPHERE_PLANE, [0, 0, 0.3, 1, 0, 0, 0], [0.5, 0.1, 0, 0.3, 0, 0], T=150)
    np.testing.assert_allclose(ours, mjs, atol=1e-6)


def test_joint_limit_exact():
    ours, mjs = _run_pair(LIMIT_HIT, [0.0], [1.5], T=150)
    np.testing.assert_allclose(ours, mjs, atol=1e-10)


def test_cylinder_push_behavioral():
    ours, mjs = _run_pair(CYLINDER_PUSH, [1.0, 0.0, 0.55, 0.0], [2.0, 0, 0, 0], T=100)
    assert np.abs(ours - mjs).max() < 2e-2


def test_rollout_vmaps_over_batch():
    mj = mujoco.MjModel.from_xml_string(CARTPOLE)
    pm = put_model(mj, dtype=jnp.float64)
    R, T = 8, 25
    rng = np.random.default_rng(0)
    qpos = rng.standard_normal((R, 2))
    qvel = 0.1 * rng.standard_normal((R, 2))
    ctrl = rng.standard_normal((R, T, 1))

    def one(qp, qv, c):
        return rollout(pm, make_state(pm, qpos=qp, qvel=qv), c).states

    batched = jax.jit(jax.vmap(one))(qpos, qvel, ctrl)
    assert batched.shape == (R, T, 4)
    # row 0 must equal an unbatched rollout
    single = one(qpos[0], qvel[0], ctrl[0])
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single), atol=1e-12)
