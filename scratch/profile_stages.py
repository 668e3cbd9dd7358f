"""Stage-ablation profile of the leap_cube rollout on the real chip."""
from __future__ import annotations

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

B, T = 320, 100


def timeit(name, fn, *args, n=8):
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
    print(f"{name:<42} compile {ct:6.1f}s  p50 {np.median(ts) * 1e3:8.2f} ms", flush=True)


def main():
    task_cls, _ = get_registered_tasks()["leap_cube"]
    task = task_cls()
    m = task.planning_model
    stepmod = importlib.import_module("judo_tpu.physics.step")
    from judo_tpu.physics import collision, linalg, smooth, solver

    print(f"nv={m.nv} ncon={collision.num_contact_slots(m)} nefc={solver.num_constraint_rows(m)}"
          f" iters={m.solver_iterations}", flush=True)

    rng = np.random.default_rng(0)
    qpos = (np.tile(np.asarray(m.qpos0), (B, 1)) + 0.01 * rng.standard_normal((B, m.nq))).astype(np.float32)
    qvel = (0.01 * rng.standard_normal((B, m.nv))).astype(np.float32)
    s0 = PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel), time=jnp.zeros(B, jnp.float32))
    ctrl = jnp.asarray(rng.standard_normal((B, T, m.nu)).astype(np.float32) * 0.1)

    def rollout_with(mm, **kw):
        return jax.jit(jax.vmap(lambda s, c: stepmod.rollout(mm, s, c, **kw), in_axes=(0, 0)))

    timeit("full rollout", rollout_with(m), s0, ctrl)
    timeit("full rollout unroll=2", rollout_with(m, unroll=2), s0, ctrl)
    timeit("iters=1 (APGD ablation, min 8)", rollout_with(dataclasses.replace(m, solver_iterations=1)), s0, ctrl)
    timeit("no contacts/limits (smooth+integrate)",
           rollout_with(dataclasses.replace(m, contact_enabled=False, limit_enabled=False)), s0, ctrl)

    # scan over kinematics only
    def kin_scan(s, c):
        def body(carry, ctrl_t):
            kin = smooth.kinematics(m, carry)
            carry = PhysicsState(qpos=carry.qpos + 1e-7 * kin.geom_xpos[0, 0], qvel=carry.qvel, time=carry.time)
            return carry, kin.geom_xpos[0]
        return jax.lax.scan(body, s, c)[1]
    timeit("kinematics-only scan", jax.jit(jax.vmap(kin_scan, in_axes=(0, 0))), s0, ctrl)

    def col_scan(s, c):
        def body(carry, ctrl_t):
            kin = smooth.kinematics(m, carry)
            con = collision.find_contacts(m, kin)
            carry = PhysicsState(qpos=carry.qpos + 1e-7 * con.dist[0], qvel=carry.qvel, time=carry.time)
            return carry, con.dist[0]
        return jax.lax.scan(body, s, c)[1]
    timeit("kin+collision scan", jax.jit(jax.vmap(col_scan, in_axes=(0, 0))), s0, ctrl)

    def gj_scan(s, c):
        def body(carry, ctrl_t):
            kin = smooth.kinematics(m, carry)
            com = smooth.com_quantities(m, kin)
            mm = smooth.crb_mass_matrix(m, com)
            minv = linalg.spd_inverse(mm)
            carry = PhysicsState(qpos=carry.qpos + 1e-7 * minv[0, 0], qvel=carry.qvel, time=carry.time)
            return carry, minv[0, 0]
        return jax.lax.scan(body, s, c)[1]
    timeit("kin+com+crb+1xGJ scan", jax.jit(jax.vmap(gj_scan, in_axes=(0, 0))), s0, ctrl)


if __name__ == "__main__":
    main()
