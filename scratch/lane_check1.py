import sys; sys.path.insert(0, "/root/repo")
import os
os.environ["JAX_PLATFORMS"]="cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
import mujoco
from judo_tpu.physics import put_model, make_state
from judo_tpu.physics import smooth, lane_engine as le
from judo_tpu.physics.model import PhysicsState

XML = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1"/>
    <body name="link1" pos="0 0 0.4">
      <joint name="j1" type="hinge" axis="0 1 0" range="-1.5 1.5" damping="0.2" stiffness="3" springref="0.2"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04" mass="0.5"/>
      <body name="link2" pos="0.3 0 0">
        <joint name="j2" type="slide" axis="1 0 0" range="-0.2 0.2" damping="0.1"/>
        <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.035" mass="0.3"/>
        <body name="tip" pos="0.25 0 0">
          <joint name="j3" type="ball" damping="0.05"/>
          <geom type="sphere" size="0.04" mass="0.1"/>
        </body>
      </body>
    </body>
    <body name="box" pos="0.45 0 0.08">
      <freejoint/>
      <geom type="box" size="0.06 0.06 0.06" mass="0.2"/>
    </body>
  </worldbody>
  <actuator>
    <position joint="j1" kp="30" ctrlrange="-1.5 1.5"/>
    <position joint="j2" kp="20" ctrlrange="-2 2" forcerange="-5 5"/>
  </actuator>
</mujoco>
"""
mj = mujoco.MjModel.from_xml_string(XML)
pm = put_model(mj, dtype=jnp.float64)
rng = np.random.default_rng(0)
B = 4
qpos = np.tile(np.asarray(jax.device_get(pm.qpos0)), (B,1)) + 0.1*rng.standard_normal((B, pm.nq))
# normalize quats in qpos (ball at some adr + free at some adr)
for j in range(pm.njnt):
    jt = pm.jnt_type[j]; qa = pm.jnt_qposadr[j]
    if jt == 1: qpos[:, qa:qa+4] /= np.linalg.norm(qpos[:, qa:qa+4],axis=1,keepdims=True)
    if jt == 0: qpos[:, qa+3:qa+7] /= np.linalg.norm(qpos[:, qa+3:qa+7],axis=1,keepdims=True)
qvel = 0.5*rng.standard_normal((B, pm.nv))
ctrl = 0.3*rng.standard_normal((B, pm.nu))

# reference path (vmap single-state)
def ref_all(qp, qv, c):
    s = PhysicsState(qpos=qp, qvel=qv, time=jnp.zeros(()))
    kin = smooth.kinematics(pm, s)
    com = smooth.com_quantities(pm, kin)
    vel = smooth.velocity(pm, com, qv)
    mm = smooth.crb_mass_matrix(pm, com)
    bias = smooth.rne_bias(pm, com, vel, qv)
    qfrc_p = smooth.passive_force(pm, s)
    qfrc_a = smooth.actuation(pm, s, c)
    from judo_tpu.physics import linalg
    minv = linalg.spd_inverse(mm)
    return kin.geom_xpos, kin.geom_xmat, kin.site_xpos, mm, bias, qfrc_p, qfrc_a, minv, com.cdof

import time; t0=time.time()
rg = jax.jit(jax.vmap(ref_all))(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))

# lane path (batch-last)
print("ref path done", time.time()-t0, flush=True); t0=time.time()
qpT = jnp.asarray(qpos.T); qvT = jnp.asarray(qvel.T); cT = jnp.asarray(ctrl.T)
def lane_all(qpT, qvT, cT):
    kinl = le.kinematics_l(pm, qpT)
    coml = le.com_l(pm, kinl)
    vell = le.velocity_l(pm, coml, qvT)
    mml = le.crb_mass_matrix_l(pm, coml)
    biasl = le.rne_bias_l(pm, coml, vell, qvT)
    qfrc_pl = le.passive_force_l(pm, qpT, qvT)
    qfrc_al = le.actuation_l(pm, qpT, qvT, cT)
    minvl = le.spd_inverse_l(mml)
    return kinl, coml, mml, biasl, qfrc_pl, qfrc_al, minvl
kinl, coml, mml, biasl, qfrc_pl, qfrc_al, minvl = jax.jit(lane_all)(qpT, qvT, cT)
import jax as _j; _j.block_until_ready(mml); print("lane path done", time.time()-t0, flush=True)

def chk(name, ref, lane_val, perm):
    r = np.asarray(ref); l = np.asarray(lane_val).transpose(perm)
    if r.size == 0:
        print(f"{name:<14} (empty) OK"); return
    err = np.abs(r-l).max()
    print(f"{name:<14} maxerr {err:.3e}", "OK" if err < 1e-9 else "FAIL")

chk("geom_xpos", rg[0], jnp.stack(kinl.geom_xpos), (2,0,1))
chk("geom_xmat", rg[1], jnp.stack(kinl.geom_xmat), (3,0,1,2))
chk("site_xpos", rg[2], jnp.stack(kinl.site_xpos) if pm.nsite else jnp.zeros((0,3,B)), (2,0,1))
chk("mass_matrix", rg[3], mml, (2,0,1))
chk("rne_bias", rg[4], biasl, (1,0))
chk("passive", rg[5], qfrc_pl, (1,0))
chk("actuation", rg[6], qfrc_al, (1,0))
chk("minv", rg[7], minvl, (2,0,1))
chk("cdof", rg[8], jnp.stack(coml.cdof), (2,0,1))
