"""Same-process A/B: cold per-step GJ inverses vs NS temporal warm-start."""
import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np

from judo_tpu.tasks import get_registered_tasks
from judo_tpu.physics.model import PhysicsState
import importlib

stepmod = importlib.import_module("judo_tpu.physics.step")

B, T = 320, 100

task_cls, _ = get_registered_tasks()["leap_cube"]
m = task_cls().planning_model

rng = np.random.default_rng(0)
qpos = (np.tile(np.asarray(m.qpos0), (B, 1)) + 0.01 * rng.standard_normal((B, m.nq))).astype(np.float32)
qvel = (0.01 * rng.standard_normal((B, m.nv))).astype(np.float32)
s0 = PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel), time=jnp.zeros(B, jnp.float32))
ctrl = jnp.asarray(rng.standard_normal((B, T, m.nu)).astype(np.float32) * 0.1)


def timeit(name, fn, *args, n=10):
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
    print(f"{name:<36} compile {ct:6.1f}s  p50 {np.median(ts) * 1e3:8.2f} ms", flush=True)
    return out


def rollout_cold(s, c):
    """Old formulation: exact GJ inverses every step (no carries)."""
    from judo_tpu.physics.solver import num_constraint_rows

    nefc = num_constraint_rows(m)

    def body(carry, ctrl_t):
        s, f = carry
        s, res, _ = stepmod.step_with_forward(m, s, ctrl_t, f)
        return (s, res.efc_force), (jnp.concatenate([s.qpos, s.qvel]), res.sensordata)

    f0 = jnp.zeros(nefc, s.qpos.dtype)
    (_, _), out = jax.lax.scan(body, (s, f0), c)
    return out


ro_cold = jax.jit(jax.vmap(rollout_cold, in_axes=(0, 0)))
ro_ns = jax.jit(jax.vmap(lambda s, c: stepmod.rollout(m, s, c), in_axes=(0, 0)))

a = timeit("cold GJ every step", ro_cold, s0, ctrl)
b = timeit("NS carried inverses", ro_ns, s0, ctrl)
# numeric agreement over the horizon
sa = np.asarray(a[0])
sb = np.asarray(b.states)
print("max |state diff| over horizon:", float(np.max(np.abs(sa - sb))), flush=True)
