"""Layout experiment: batch-last vmap vs batch-first for the leap rollout."""
import sys

sys.path.insert(0, "/root/repo")

import importlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from judo_tpu.tasks import get_registered_tasks
from judo_tpu.physics.model import PhysicsState

B, T = 320, 100

task_cls, _ = get_registered_tasks()["leap_cube"]
m = task_cls().planning_model
stepmod = importlib.import_module("judo_tpu.physics.step")

rng = np.random.default_rng(0)
qpos = (np.tile(np.asarray(m.qpos0), (B, 1)) + 0.01 * rng.standard_normal((B, m.nq))).astype(np.float32)
qvel = (0.01 * rng.standard_normal((B, m.nv))).astype(np.float32)
ctrl = (rng.standard_normal((B, T, m.nu)) * 0.1).astype(np.float32)


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
    print(f"{name:<40} compile {ct:6.1f}s  p50 {np.median(ts) * 1e3:8.2f} ms", flush=True)


# batch-first (current)
s0 = PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel), time=jnp.zeros(B, jnp.float32))
ro_bf = jax.jit(jax.vmap(lambda s, c: stepmod.rollout(m, s, c), in_axes=(0, 0)))
timeit("batch-first vmap(axis 0)", ro_bf, s0, jnp.asarray(ctrl))

# batch-last: all batched leaves carry B on the LAST axis
s0_bl = PhysicsState(qpos=jnp.asarray(qpos.T), qvel=jnp.asarray(qvel.T), time=jnp.zeros(B, jnp.float32))
ctrl_bl = jnp.asarray(np.moveaxis(ctrl, 0, -1))  # (T, nu, B)
ro_bl = jax.jit(
    jax.vmap(
        lambda s, c: stepmod.rollout(m, s, c),
        in_axes=(PhysicsState(qpos=-1, qvel=-1, time=0), -1),
        out_axes=-1,
    )
)
timeit("batch-last vmap(axis -1)", ro_bl, s0_bl, ctrl_bl)
