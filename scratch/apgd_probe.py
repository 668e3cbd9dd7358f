import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
import mujoco
from judo_tpu.physics import put_model
from judo_tpu.physics import lane_engine as le, lane_step as ls, lane_collision as lc

XML = open("scratch/lane_check3.py").read().split('XML = """')[1].split('"""')[0]
mj = mujoco.MjModel.from_xml_string(XML)
pm = put_model(mj, dtype=jnp.float64)
rng = np.random.default_rng(1)
B = 5
qpos = np.tile(np.asarray(jax.device_get(pm.qpos0)), (B,1)) + 0.05*rng.standard_normal((B, pm.nq))
for j in range(pm.njnt):
    jt = pm.jnt_type[j]; qa = pm.jnt_qposadr[j]
    if jt == 0: qpos[:, qa+3:qa+7] /= np.linalg.norm(qpos[:, qa+3:qa+7],axis=1,keepdims=True)
qvel = 0.4*rng.standard_normal((B, pm.nv))
qpT, qvT = jnp.asarray(qpos.T), jnp.asarray(qvel.T)

def setup(qpT, qvT):
    kin = le.kinematics_l(pm, qpT)
    com = le.com_l(pm, kin)
    mm = le.crb_mass_matrix_l(pm, com)
    minv = le.spd_inverse_l(mm)
    qfrc = le.passive_force_l(pm, qpT, qvT) - le.rne_bias_l(pm, com, le.velocity_l(pm, com, qvT), qvT)
    qacc_smooth = le.mat_vec_l(minv, qfrc)
    cons = lc.find_contacts_l(pm, kin)
    rows = ls.assemble_constraints_l(pm, com, cons, qpT, qvT)
    J = rows.J * rows.active[:, None, :]
    aref = rows.aref * rows.active
    reg = jnp.where(rows.active > 0, rows.reg, 1.0)
    b = jnp.sum(J * qacc_smooth[None, :, :], axis=1) - aref
    return J, minv, reg, b

J, minv, reg, b = jax.jit(setup)(qpT, qvT)

def obj(J, minv, reg, b, f):
    kv = jnp.sum(jnp.sum(minv[:, :, None, :] * jnp.swapaxes(J,0,1)[None], axis=1) * f[None], axis=1)
    Af = jnp.sum(J * kv[None], axis=1) + reg * f
    return 0.5*jnp.sum(f*Af, axis=0) + jnp.sum(f*b, axis=0)

for iters in (50, 100, 200, 500, 2000):
    f = jax.jit(lambda J,minv,reg,b: ls.solve_dual_qp_l(J, minv, reg, b, iters, None))(J, minv, reg, b)
    o = obj(J, minv, reg, b, f)
    print(f"iters {iters:5d} obj per lane:", np.array2string(np.asarray(o), precision=8), flush=True)
