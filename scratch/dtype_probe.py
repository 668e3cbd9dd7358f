import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from judo_tpu.tasks import get_registered_tasks
from judo_tpu.physics import lane_engine as le, lane_step as ls
from judo_tpu.physics.lane_collision import find_contacts_l
from judo_tpu.physics.solver import num_constraint_rows

task_cls, _ = get_registered_tasks()["cylinder_push"]
task = task_cls()
pm = task.planning_model
B = 8
dt = pm.qpos0.dtype
print("model dtype:", dt)
qp = jnp.zeros((pm.nq, B), dt) + pm.qpos0[:, None]
qv = jnp.zeros((pm.nv, B), dt)
ct = jnp.zeros((pm.nu, B), dt)

kin = le.kinematics_l(pm, qp)
print("kin xpos:", kin.xpos[1].dtype, "xmat:", kin.xmat[1].dtype)
com = le.com_l(pm, kin)
print("com cdof:", com.cdof[0].dtype)
vel = le.velocity_l(pm, com, qv)
mm = le.crb_mass_matrix_l(pm, com)
print("mm:", mm.dtype)
qfrc_bias = le.rne_bias_l(pm, com, vel, qv)
print("bias:", qfrc_bias.dtype)
act = le.actuation_l(pm, qp, qv, ct)
print("act:", act.dtype)
pas = le.passive_force_l(pm, qp, qv)
print("passive:", pas.dtype)
minv = le.spd_inverse_l(mm)
print("minv:", minv.dtype)
cons = find_contacts_l(pm, kin)
for i, c in enumerate(cons[:3]):
    print(f"contact{i}: dist {c.dist.dtype} pos {c.pos.dtype} normal {c.normal.dtype} friction {type(c.friction)} margin {type(c.includemargin)}")
rows = ls.assemble_constraints_l(pm, com, cons, qp, qv)
if rows is not None:
    print("rows J:", rows.J.dtype, "aref:", rows.aref.dtype, "reg:", rows.reg.dtype, "active:", rows.active.dtype)
out = ls.step_l(pm, qp, qv, ct, jnp.zeros((max(num_constraint_rows(pm),1), B), dt))
print("step qpos:", out.qpos.dtype, "qvel:", out.qvel.dtype, "sens:", out.sensordata.dtype, "efc:", out.efc_force.dtype)
