"""Time the full leap_cube rollout (batch 320, T=100) on the real chip."""
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
task = task_cls()
m = task.planning_model
stepmod = importlib.import_module("judo_tpu.physics.step")

rng = np.random.default_rng(0)
qpos = (np.tile(np.asarray(m.qpos0), (B, 1)) + 0.01 * rng.standard_normal((B, m.nq))).astype(np.float32)
qvel = (0.01 * rng.standard_normal((B, m.nv))).astype(np.float32)
s0 = PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel), time=jnp.zeros(B, jnp.float32))
ctrl = jnp.asarray(rng.standard_normal((B, T, m.nu)).astype(np.float32) * 0.1)

ro = jax.jit(jax.vmap(lambda s, c: stepmod.rollout(m, s, c), in_axes=(0, 0)))
t0 = time.time()
out = ro(s0, ctrl)
jax.block_until_ready(out)
print(f"compile+first run: {time.time() - t0:.1f}s", flush=True)
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    out = ro(s0, ctrl)
    jax.block_until_ready(out)
    ts.append(time.perf_counter() - t0)
p50 = float(np.median(ts) * 1000)
print(f"rollout p50: {p50:.2f} ms  ({B * T / (p50 / 1000):.0f} steps/s, {B / (p50 / 1000):.0f} rollouts/s)", flush=True)
