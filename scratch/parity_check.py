"""Scratch: physics parity vs CPU mujoco on smooth-dynamics models."""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import mujoco
import numpy as np
import jax.numpy as jnp

from judo_tpu.physics import put_model, make_state, rollout, step, forward
from judo_tpu.physics.model import PhysicsState

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


def compare(name, xml, qpos0, qvel0, T=200, nu_wave=True):
    mj = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(mj)
    pm = put_model(mj, dtype=jnp.float64)

    rng = np.random.default_rng(0)
    ctrl = 0.5 * np.sin(0.05 * np.arange(T))[:, None] * np.ones((1, mj.nu)) if nu_wave else rng.standard_normal((T, mj.nu))

    # mujoco rollout
    d.qpos[:] = qpos0
    d.qvel[:] = qvel0
    mj_states = []
    mj_sens = []
    for t in range(T):
        d.ctrl[:] = ctrl[t]
        mujoco.mj_step(mj, d)
        mj_states.append(np.concatenate([d.qpos.copy(), d.qvel.copy()]))
        mj_sens.append(d.sensordata.copy())
    mj_states = np.array(mj_states)
    mj_sens = np.array(mj_sens)

    # ours
    s0 = make_state(pm, qpos=qpos0, qvel=qvel0)
    out = jax.jit(lambda s, c: rollout(pm, s, c))(s0, jnp.asarray(ctrl))
    our_states = np.asarray(out.states)
    our_sens = np.asarray(out.sensordata)

    err_q = np.abs(our_states - mj_states).max()
    err_s = np.abs(our_sens - mj_sens).max() if mj_sens.size else 0.0
    print(f"{name}: max state err {err_q:.3e}, max sensor err {err_s:.3e}")
    if err_q > 1e-6:
        # find first divergence
        per_t = np.abs(our_states - mj_states).max(axis=1)
        t_bad = int(np.argmax(per_t > 1e-9))
        print("  first divergence at t =", t_bad, "ours", our_states[t_bad], "mj", mj_states[t_bad])
    return err_q, err_s


if __name__ == "__main__":
    compare("cartpole", CARTPOLE, np.array([0.3, 2.5]), np.array([0.1, -0.2]))


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
    <body>
      <geom mass="0" name="floor" pos="0 0 -0.25" condim="3" size="10.0 10.0 0.10" rgba="0 1 1 1" type="box"/>
    </body>
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
    <position name="actuator_pusher_x" joint="slider_x" kp="10" ctrlrange="-10 10" forcerange="-1000 1000"/>
    <position name="actuator_pusher_y" joint="slider_y" kp="10" ctrlrange="-10 10" forcerange="-1000 1000"/>
  </actuator>
  <sensor>
    <framepos name="trace_pusher" objtype="site" objname="pusher_site"/>
    <framepos name="trace_cart" objtype="site" objname="cart_site"/>
  </sensor>
</mujoco>
"""

def run_all():
    compare("cartpole", CARTPOLE, np.array([0.3, 2.5]), np.array([0.1, -0.2]))
    compare("sphere_plane", SPHERE_PLANE, np.array([0, 0, 0.3, 1, 0, 0, 0.0]), np.array([0.5, 0.1, 0, 0.3, 0, 0]), T=150)
    compare("limit_hit", LIMIT_HIT, np.array([0.0]), np.array([1.5]), T=150)
    compare("cylinder_push", CYLINDER_PUSH, np.array([1.0, 0.0, 0.55, 0.0]), np.array([2.0, 0.0, 0.0, 0.0]), T=100)

if __name__ == "__main__":
    run_all()
