"""Contact-pipeline breakdown: assembly vs APGD iteration scaling, at B=320 T=100."""
import sys

sys.path.insert(0, "/root/repo")

import dataclasses
import importlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from judo_tpu.tasks import get_registered_tasks
from judo_tpu.physics.model import PhysicsState
from judo_tpu.physics import collision, linalg, smooth, solver

stepmod = importlib.import_module("judo_tpu.physics.step")

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
    print(f"{name:<46} compile {ct:6.1f}s  p50 {np.median(ts) * 1e3:8.2f} ms"
          f"  ({np.median(ts) * 1e4:6.1f} us/step)", flush=True)


def scan_stage(fn_of_state):
    def one(s, c):
        def body(carry, ctrl_t):
            out = fn_of_state(carry, ctrl_t)
            carry = PhysicsState(qpos=carry.qpos + 1e-12 * out, qvel=carry.qvel, time=carry.time)
            return carry, out
        return jax.lax.scan(body, s, c)[1]
    return jax.jit(jax.vmap(one, in_axes=(0, 0)))


def f_base(s, c):
    kin = smooth.kinematics(m, s)
    com = smooth.com_quantities(m, kin)
    mm = smooth.crb_mass_matrix(m, com)
    con = collision.find_contacts(m, kin)
    return kin, com, mm, con

def f_upto_col(s, c):
    kin, com, mm, con = f_base(s, c)
    return mm.sum() + con.dist.sum() + con.pos.sum() + con.frame.sum()

def f_assemble(s, c):
    kin, com, mm, con = f_base(s, c)
    rows = solver.assemble_constraints(m, com, con, s.qpos, s.qvel)
    return (mm.sum() + rows.J.sum() + rows.aref.sum() + rows.reg.sum() + rows.active.sum())

def make_f_solve(iters):
    def f_solve(s, c):
        kin, com, mm, con = f_base(s, c)
        minv = linalg.spd_inverse(mm)
        mloc = dataclasses.replace(m, solver_iterations=iters)
        qacc, f = solver.solve_contacts(
            mloc, com, kin, con, mm, minv, s.qpos, s.qvel, jnp.zeros(m.nv, s.qpos.dtype), None
        )
        return qacc.sum() + f.sum()
    return f_solve


timeit("kin+com+crb+collision (all consumed)", scan_stage(f_upto_col), s0, ctrl)
timeit("+assemble (J,aref,reg consumed)", scan_stage(f_assemble), s0, ctrl)
timeit("+inv+minv_jt+apgd8", scan_stage(make_f_solve(8)), s0, ctrl)
timeit("+inv+minv_jt+apgd25", scan_stage(make_f_solve(25)), s0, ctrl)
