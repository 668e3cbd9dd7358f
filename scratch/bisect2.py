import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, dataclasses
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics import make_state
from judo_tpu.physics.step import step_with_forward
from judo_tpu.physics import smooth, collision, solver

task = LeapCube()
pm = task.planning_model
x0 = make_state(pm, qpos=QPOS_HOME)
ctrl = jnp.asarray(QPOS_HOME[7:], jnp.float32)

def t(name, fn, *args):
    t0 = time.time(); out = fn(*args); jax.block_until_ready(out)
    print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)

# 1. smooth only
pm_nc = dataclasses.replace(pm, contact_enabled=False, limit_enabled=False)
t("1 smooth-only step", jax.jit(lambda s, c: step_with_forward(pm_nc, s, c)[0].qpos), x0, ctrl)

# 2. forward pieces: kinematics+com+vel+crb+rne
def fwd_smoothparts(s, c):
    kin = smooth.kinematics(pm, s)
    com = smooth.com_quantities(pm, kin)
    vel = smooth.velocity(pm, com, s.qvel)
    mm = smooth.crb_mass_matrix(pm, com)
    bias = smooth.rne_bias(pm, com, vel, s.qvel)
    return mm.sum() + bias.sum()
t("2 smooth pipeline only", jax.jit(fwd_smoothparts), x0, ctrl)

# 3. collision only
def coll_only(s):
    kin = smooth.kinematics(pm, s)
    cons = collision.find_contacts(pm, kin)
    return cons.dist.sum() + cons.pos.sum()
t("3 kinematics+collision", jax.jit(coll_only), x0)

# 4. full constraint assembly, no QP solve
def assemble_only(s):
    kin = smooth.kinematics(pm, s)
    com = smooth.com_quantities(pm, kin)
    cons = collision.find_contacts(pm, kin)
    rows = solver.assemble_constraints(pm, com, cons, s.qpos, s.qvel)
    return rows.J.sum() + rows.aref.sum()
t("4 + assembly", jax.jit(assemble_only), x0)

# 5. + A matrix build (cho_solve with many RHS)
def amat(s):
    kin = smooth.kinematics(pm, s)
    com = smooth.com_quantities(pm, kin)
    vel = smooth.velocity(pm, com, s.qvel)
    mm = smooth.crb_mass_matrix(pm, com)
    cons = collision.find_contacts(pm, kin)
    rows = solver.assemble_constraints(pm, com, cons, s.qpos, s.qvel)
    J = rows.J * rows.active[:, None]
    fac = jax.scipy.linalg.cho_factor(mm)
    minv_jt = jax.scipy.linalg.cho_solve(fac, J.T)
    A = J @ minv_jt + jnp.diag(rows.reg)
    return A.sum()
t("5 + A matrix (cholesky/tri-solve)", jax.jit(amat), x0)

# 6. full step
t("6 full step", jax.jit(lambda s, c: step_with_forward(pm, s, c)[0].qpos), x0, ctrl)
