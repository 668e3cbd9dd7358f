"""Stage-ablation profile of the leap_cube rollout on the real chip.

Times T=100-step rollouts at batch 320 with pieces ablated, to locate the
2.28 s. Each variant is its own jit; first call compiles (excluded).
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np

from judo_tpu.tasks import get_registered_tasks

B = 320
T = 100


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)


def main():
    task_cls, cfg_cls = get_registered_tasks()["leap_cube"]
    task = task_cls()
    m = task.planning_model
    import importlib

    stepmod = importlib.import_module("judo_tpu.physics.step")
    from judo_tpu.physics import collision, solver, smooth
    from judo_tpu.physics.model import PhysicsState

    nefc = solver.num_constraint_rows(m)
    ncon = collision.num_contact_slots(m)
    print(f"nv={m.nv} nq={m.nq} nbody={m.nbody} ngeom={m.ngeom} npairs={len(m.collision_pairs)}"
          f" ncon_slots={ncon} nefc={nefc} iters={m.solver_iterations} dtype={m.qpos0.dtype}")

    rng = np.random.default_rng(0)
    qpos = jnp.asarray(np.tile(np.asarray(m.qpos0), (B, 1)) + 0.01 * rng.standard_normal((B, m.nq)))
    qvel = jnp.asarray(0.01 * rng.standard_normal((B, m.nv)))
    s0 = PhysicsState(qpos=qpos.astype(m.qpos0.dtype), qvel=qvel.astype(m.qpos0.dtype),
                      time=jnp.zeros(B, m.qpos0.dtype))
    ctrl = jnp.asarray(rng.standard_normal((B, T, m.nu)) * 0.1, m.qpos0.dtype)

    # full rollout
    ro = jax.jit(jax.vmap(lambda s, c: stepmod.rollout(m, s, c), in_axes=(0, 0)))
    print("full rollout:", timeit(ro, s0, ctrl), "ms")

    # contacts disabled (keeps limits)
    import dataclasses
    m_nc = m.replace(contact_enabled=False) if hasattr(m, "replace") else dataclasses.replace(m, contact_enabled=False)
    ro_nc = jax.jit(jax.vmap(lambda s, c: stepmod.rollout(m_nc, s, c), in_axes=(0, 0)))
    print("rollout no-contacts:", timeit(ro_nc, s0, ctrl), "ms")

    # solver iterations = 1
    m_i1 = m.replace(solver_iterations=1) if hasattr(m, "replace") else dataclasses.replace(m, solver_iterations=1)
    ro_i1 = jax.jit(jax.vmap(lambda s, c: stepmod.rollout(m_i1, s, c), in_axes=(0, 0)))
    print("rollout iters=1 (min 8 in solve_contacts):", timeit(ro_i1, s0, ctrl), "ms")

    # kinematics-only scan (same sequential structure, no dynamics)
    def kin_scan(s, c):
        def body(carry, ctrl_t):
            kin = smooth.kinematics(m, carry)
            carry = PhysicsState(qpos=carry.qpos + 1e-6 * kin.geom_xpos[0, 0], qvel=carry.qvel, time=carry.time)
            return carry, kin.geom_xpos[0]
        _, out = jax.lax.scan(body, s, c)
        return out
    ks = jax.jit(jax.vmap(kin_scan, in_axes=(0, 0)))
    print("kinematics-only scan:", timeit(ks, s0, ctrl), "ms")

    # kinematics + collision scan
    def col_scan(s, c):
        def body(carry, ctrl_t):
            kin = smooth.kinematics(m, carry)
            con = collision.find_contacts(m, kin)
            carry = PhysicsState(qpos=carry.qpos + 1e-6 * con.dist[0], qvel=carry.qvel, time=carry.time)
            return carry, con.dist
        _, out = jax.lax.scan(body, s, c)
        return out
    cs = jax.jit(jax.vmap(col_scan, in_axes=(0, 0)))
    print("kin+collision scan:", timeit(cs, s0, ctrl), "ms")

    # smooth-dynamics scan (kin + com + vel + crb + rne + chol inverse, no contacts/integration)
    def smooth_scan(s, c):
        from judo_tpu.physics import linalg
        def body(carry, ctrl_t):
            kin = smooth.kinematics(m, carry)
            com = smooth.com_quantities(m, kin)
            vel = smooth.velocity(m, com, carry.qvel)
            mm = smooth.crb_mass_matrix(m, com)
            bias = smooth.rne_bias(m, com, vel, carry.qvel)
            l = linalg.cholesky(mm)
            minv = linalg.cho_inverse(l)
            qacc = minv @ bias
            carry = PhysicsState(qpos=carry.qpos + 1e-6 * qacc[:m.nq] if m.nq <= m.nv else carry.qpos + 1e-6 * qacc[0],
                                 qvel=carry.qvel, time=carry.time)
            return carry, qacc[0]
        _, out = jax.lax.scan(body, s, c)
        return out
    ss = jax.jit(jax.vmap(smooth_scan, in_axes=(0, 0)))
    print("smooth-dynamics scan (kin+com+crb+rne+chol+inv):", timeit(ss, s0, ctrl), "ms")


if __name__ == "__main__":
    main()
