"""Per-stage scan micro-profile: time each pipeline stage standalone at B=320, T=100."""
import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np

from judo_tpu.tasks import get_registered_tasks
from judo_tpu.physics.model import PhysicsState
from judo_tpu.physics import collision, linalg, smooth, solver, step as stepmod

B, T = 320, 100

task_cls, _ = get_registered_tasks()["leap_cube"]
m = task_cls().planning_model

rng = np.random.default_rng(0)
qpos = (np.tile(np.asarray(m.qpos0), (B, 1)) + 0.01 * rng.standard_normal((B, m.nq))).astype(np.float32)
qvel = (0.01 * rng.standard_normal((B, m.nv))).astype(np.float32)
s0 = PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel), time=jnp.zeros(B, jnp.float32))
ctrl = jnp.asarray(rng.standard_normal((B, T, m.nu)).astype(np.float32) * 0.1)


def timeit(name, fn, *args, n=6):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    ct = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:<44} compile {ct:6.1f}s  p50 {np.median(ts) * 1e3:8.2f} ms"
          f"  ({np.median(ts) * 1e4:6.1f} us/step)", flush=True)


def scan_stage(fn_of_state):
    """Scan a stage T times, feeding a perturbation back so nothing is DCE'd."""
    def one(s, c):
        def body(carry, ctrl_t):
            out = fn_of_state(carry, ctrl_t)
            carry = PhysicsState(
                qpos=carry.qpos + 1e-9 * out, qvel=carry.qvel, time=carry.time
            )
            return carry, out
        return jax.lax.scan(body, s, c)[1]
    return jax.jit(jax.vmap(one, in_axes=(0, 0)))


# precompute per-state quantities OUTSIDE jit to feed fixed ones? No: stage fns
# re-derive what they need so each number includes its real deps minus the prior row.

def f_kin(s, c):
    kin = smooth.kinematics(m, s)
    return kin.geom_xpos[0, 0]

def f_com(s, c):
    kin = smooth.kinematics(m, s)
    com = smooth.com_quantities(m, kin)
    return com.cdof[0, 0]

def f_crb(s, c):
    kin = smooth.kinematics(m, s)
    com = smooth.com_quantities(m, kin)
    mm = smooth.crb_mass_matrix(m, com)
    return mm[0, 0]

def f_crb_inv(s, c):
    kin = smooth.kinematics(m, s)
    com = smooth.com_quantities(m, kin)
    mm = smooth.crb_mass_matrix(m, com)
    return linalg.spd_inverse(mm)[0, 0]

def f_crb_2inv(s, c):
    kin = smooth.kinematics(m, s)
    com = smooth.com_quantities(m, kin)
    mm = smooth.crb_mass_matrix(m, com)
    a = linalg.spd_inverse(mm)[0, 0]
    b = linalg.spd_inverse(mm + jnp.eye(m.nv, dtype=mm.dtype))[0, 0]
    return a + b

def f_rne(s, c):
    kin = smooth.kinematics(m, s)
    com = smooth.com_quantities(m, kin)
    vel = smooth.velocity(m, com, s.qvel)
    return smooth.rne_bias(m, com, vel, s.qvel)[0]

def f_col(s, c):
    kin = smooth.kinematics(m, s)
    con = collision.find_contacts(m, kin)
    return con.dist[0]

def f_assemble(s, c):
    kin = smooth.kinematics(m, s)
    com = smooth.com_quantities(m, kin)
    con = collision.find_contacts(m, kin)
    rows = solver.assemble_constraints(m, com, con, s.qpos, s.qvel)
    return rows.J[0, 0] + rows.aref[0]

def f_full_contact(s, c):
    kin = smooth.kinematics(m, s)
    com = smooth.com_quantities(m, kin)
    mm = smooth.crb_mass_matrix(m, com)
    minv = linalg.spd_inverse(mm)
    con = collision.find_contacts(m, kin)
    qacc, f = solver.solve_contacts(
        m, com, kin, con, mm, minv, s.qpos, s.qvel, jnp.zeros(m.nv, s.qpos.dtype), None
    )
    return qacc[0]


timeit("kin", scan_stage(f_kin), s0, ctrl)
timeit("kin+com", scan_stage(f_com), s0, ctrl)
timeit("kin+com+crb", scan_stage(f_crb), s0, ctrl)
timeit("kin+com+crb+1 GJ inverse", scan_stage(f_crb_inv), s0, ctrl)
timeit("kin+com+crb+2 GJ inverses", scan_stage(f_crb_2inv), s0, ctrl)
timeit("kin+com+vel+rne", scan_stage(f_rne), s0, ctrl)
timeit("kin+collision", scan_stage(f_col), s0, ctrl)
timeit("kin+com+col+assemble", scan_stage(f_assemble), s0, ctrl)
timeit("kin+com+crb+inv+col+assemble+apgd", scan_stage(f_full_contact), s0, ctrl)
