import sys; sys.path.insert(0, "/root/repo")
import os
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
import mujoco
from judo_tpu.physics import put_model
from judo_tpu.physics.model import PhysicsState
import importlib
stepmod = importlib.import_module('judo_tpu.physics.step')
from judo_tpu.physics import lane_step as ls

XML = open("/root/repo/scratch/_armbox.xml").read() if os.path.exists("/root/repo/scratch/_armbox.xml") else """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1"/>
    <body name="link1" pos="0 0 0.25">
      <joint name="j1" type="hinge" axis="0 1 0" range="-1.5 1.5" damping="0.2"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04" mass="0.5"/>
      <body name="link2" pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" range="-2 2" damping="0.1"/>
        <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.035" mass="0.3"/>
      </body>
    </body>
    <body name="box" pos="0.45 0 0.08">
      <freejoint/>
      <geom type="box" size="0.06 0.06 0.06" mass="0.2"/>
    </body>
    <body name="ball" pos="0.1 0.1 0.3">
      <freejoint/>
      <geom type="sphere" size="0.05" mass="0.1"/>
    </body>
  </worldbody>
  <actuator>
    <position joint="j1" kp="30" ctrlrange="-1.5 1.5"/>
    <position joint="j2" kp="20" ctrlrange="-2 2"/>
  </actuator>
</mujoco>
"""
mj = mujoco.MjModel.from_xml_string(XML)
pm = put_model(mj, dtype=jnp.float64)
from judo_tpu.physics.solver import num_constraint_rows
print("nefc", num_constraint_rows(pm), "pairs", len(pm.collision_pairs), flush=True)
rng = np.random.default_rng(1)
B = 5
qpos = np.tile(np.asarray(jax.device_get(pm.qpos0)), (B,1))
qpos += 0.05*rng.standard_normal((B, pm.nq))
for j in range(pm.njnt):
    jt = pm.jnt_type[j]; qa = pm.jnt_qposadr[j]
    if jt == 0: qpos[:, qa+3:qa+7] /= np.linalg.norm(qpos[:, qa+3:qa+7],axis=1,keepdims=True)
qvel = 0.4*rng.standard_normal((B, pm.nv))
ctrl = 0.3*rng.standard_normal((B, pm.nu))

# reference: vmapped single-state cold step + forward intermediates
def ref_one(qp, qv, c):
    s = PhysicsState(qpos=qp, qvel=qv, time=jnp.zeros(()))
    s2, res, _ = stepmod.step_with_forward(pm, s, c)
    return s2.qpos, s2.qvel, res.sensordata, res.efc_force
rq, rv, rs, rf = jax.jit(jax.vmap(ref_one))(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))

out = jax.jit(lambda a,b,c: ls.step_l(pm, a, b, c))(jnp.asarray(qpos.T), jnp.asarray(qvel.T), jnp.asarray(ctrl.T))

def chk(name, ref, lane, tol):
    r = np.asarray(ref); l = np.asarray(lane).T
    if r.size == 0: print(f"{name:<12} empty"); return
    err = np.abs(r-l).max()
    print(f"{name:<12} maxerr {err:.3e}", "OK" if err < tol else "FAIL")

chk("qpos", rq, out.qpos, 1e-6)
chk("qvel", rv, out.qvel, 1e-5)
chk("sensordata", rs, out.sensordata, 1e-8)
chk("efc_force", rf, out.efc_force, 1e-3)
