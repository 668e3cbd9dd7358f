import sys; sys.path.insert(0, "/root/repo")
import importlib
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
import mujoco
from judo_tpu.physics import put_model
from judo_tpu.physics.model import PhysicsState
from judo_tpu.physics import smooth, collision, solver
from judo_tpu.physics import lane_engine as le, lane_step as ls, lane_collision as lc

XML = """
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
rng = np.random.default_rng(1)
B = 5
qpos = np.tile(np.asarray(jax.device_get(pm.qpos0)), (B,1))
qpos += 0.05*rng.standard_normal((B, pm.nq))
for j in range(pm.njnt):
    jt = pm.jnt_type[j]; qa = pm.jnt_qposadr[j]
    if jt == 0: qpos[:, qa+3:qa+7] /= np.linalg.norm(qpos[:, qa+3:qa+7],axis=1,keepdims=True)
qvel = 0.4*rng.standard_normal((B, pm.nv))

def ref_stage(qp, qv):
    s = PhysicsState(qpos=qp, qvel=qv, time=jnp.zeros(()))
    kin = smooth.kinematics(pm, s)
    com = smooth.com_quantities(pm, kin)
    con = collision.find_contacts(pm, kin)
    rows = solver.assemble_constraints(pm, com, con, qp, qv)
    return con.dist, con.pos, con.frame, rows.J, rows.aref, rows.reg, rows.active
rd, rp, rfr, rJ, raref, rreg, ract = jax.jit(jax.vmap(ref_stage))(jnp.asarray(qpos), jnp.asarray(qvel))

def lane_stage(qpT, qvT):
    kin = le.kinematics_l(pm, qpT)
    com = le.com_l(pm, kin)
    cons = lc.find_contacts_l(pm, kin)
    rows = ls.assemble_constraints_l(pm, com, cons, qpT, qvT)
    dist = jnp.stack([c.dist for c in cons])
    pos = jnp.stack([c.pos for c in cons])
    nrm = jnp.stack([c.normal for c in cons])
    return dist, pos, nrm, rows.J, rows.aref, rows.reg, rows.active
ld, lp, lnrm, lJ, laref, lreg, lact = jax.jit(lane_stage)(jnp.asarray(qpos.T), jnp.asarray(qvel.T))

def chk(name, ref, lane, perm, tol=1e-9, mask=None):
    r = np.asarray(ref); l = np.asarray(lane).transpose(perm)
    err = np.abs(r-l)
    if mask is not None: err = err * mask
    err = err.max()
    print(f"{name:<10} maxerr {err:.3e}", "OK" if err < tol else "FAIL")

chk("dist", rd, ld, (1,0))
# pos/frame only matter for near-touching slots: mask dist > 0.05 away
act_mask = (np.asarray(rd) < 0.05)
chk("pos", rp, lp, (2,0,1), mask=act_mask[:,:,None])
chk("normal", rfr[:,:,0,:], lnrm, (2,0,1), mask=act_mask[:,:,None])
chk("J", rJ, lJ, (2,0,1), tol=1e-8, mask=np.asarray(ract)[:,:,None])
chk("aref", raref, laref, (1,0), tol=1e-8, mask=np.asarray(ract))
chk("reg", rreg, lreg, (1,0), tol=1e-8, mask=np.asarray(ract))
chk("active", ract, lact, (1,0))

# --- solver convergence probe: lanes APGD with many iterations ---
def ref_full(qp, qv):
    s = PhysicsState(qpos=qp, qvel=qv, time=jnp.zeros(()))
    kin = smooth.kinematics(pm, s)
    com = smooth.com_quantities(pm, kin)
    mm = smooth.crb_mass_matrix(pm, com)
    from judo_tpu.physics import linalg
    minv = linalg.spd_inverse(mm)
    vel = smooth.velocity(pm, com, qv)
    qfrc = smooth.actuation(pm, s, jnp.zeros(pm.nu)) + smooth.passive_force(pm, s) - smooth.rne_bias(pm, com, vel, qv)
    qacc_smooth = minv @ qfrc
    con = collision.find_contacts(pm, kin)
    qacc, f = solver.solve_contacts(pm, com, kin, con, mm, minv, qp, qv, qacc_smooth, None)
    return qacc, f
rqa, rff = jax.jit(jax.vmap(ref_full))(jnp.asarray(qpos), jnp.asarray(qvel))

def lane_full(qpT, qvT, iters):
    kin = le.kinematics_l(pm, qpT)
    com = le.com_l(pm, kin)
    mm = le.crb_mass_matrix_l(pm, com)
    minv = le.spd_inverse_l(mm)
    qfrc = le.actuation_l(pm, qpT, qvT, jnp.zeros((pm.nu, qpT.shape[-1]), qpT.dtype)) + le.passive_force_l(pm, qpT, qvT) - le.rne_bias_l(pm, com, le.velocity_l(pm, com, qvT), qvT)
    qacc_smooth = le.mat_vec_l(minv, qfrc)
    cons = lc.find_contacts_l(pm, kin)
    rows = ls.assemble_constraints_l(pm, com, cons, qpT, qvT)
    J = rows.J * rows.active[:, None, :]
    aref = rows.aref * rows.active
    reg = jnp.where(rows.active > 0, rows.reg, 1.0)
    b = jnp.sum(J * qacc_smooth[None, :, :], axis=1) - aref
    f = ls.solve_dual_qp_l(J, minv, reg, b, iters, None)
    qacc = qacc_smooth + le.mat_vec_l(minv, jnp.sum(J * f[:, None, :], axis=0))
    return qacc, f

for iters in (8, 25, 100, 500, 2000):
    lqa, lff = jax.jit(lambda a,b: lane_full(a,b,iters))(jnp.asarray(qpos.T), jnp.asarray(qvel.T))
    ea = np.abs(np.asarray(rqa) - np.asarray(lqa).T).max()
    ef = np.abs(np.asarray(rff) - np.asarray(lff).T).max()
    print(f"iters {iters:5d}  qacc err {ea:.3e}  f err {ef:.3e}", flush=True)
