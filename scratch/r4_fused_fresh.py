"""Fused rollout benchmark with FRESH args per call.

The axon tunnel has a pathological slow path for repeated identical-arg
executions (~27 ms penalty measured on a 0.4 ms matmul; scratch r4) — every
earlier rollout A/B used identical args and is inflated by it. Here ctrl is
derived on-device from a per-call PRNG key (the real MPC loop also has fresh
state every solve).
"""
import sys; sys.path.insert(0, "/root/repo")
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from judo_tpu.physics.pallas_step import LANE_COMPILER_OPTIONS, rollout_lanes
from judo_tpu.tasks import get_registered_tasks

ITERS = int(os.environ.get("ITERS", "8"))

task_cls, _ = get_registered_tasks()["leap_cube"]
task = task_cls()
pm = task.planning_model
R, T = 320, 100
qp = jnp.asarray(np.tile(task.data.qpos, (R, 1)), jnp.float32)
qv = jnp.zeros((R, pm.nv), jnp.float32)
mid = jnp.asarray(0.5 * (task.actuator_ctrlrange[:, 0] + task.actuator_ctrlrange[:, 1]), jnp.float32)


@jax.jit
def run(key):
    ct = mid + 0.1 * jax.random.normal(key, (R, T, pm.nu), jnp.float32)
    out = rollout_lanes(pm, qp, qv, ct, iterations=ITERS, backend="pallas")
    return out.states[:, -1].sum()


t0 = time.perf_counter()
jax.block_until_ready(run(jax.random.key(0)))
print(f"compile {time.perf_counter()-t0:.1f}s  iters={ITERS}", flush=True)

# fresh-arg sequential blocking (the MPC pattern)
ts = []
for i in range(1, 21):
    t0 = time.perf_counter()
    jax.block_until_ready(run(jax.random.key(i)))
    ts.append(time.perf_counter() - t0)
p50 = np.median(ts) * 1e3
print(f"fresh sequential: p50 {p50:8.2f} ms  min {np.min(ts)*1e3:8.2f} ms")

# fresh-arg pipelined: enqueue 10, block once (amortizes tunnel latency)
outs = []
t0 = time.perf_counter()
for i in range(100, 110):
    outs.append(run(jax.random.key(i)))
jax.block_until_ready(outs)
per = (time.perf_counter() - t0) / 10 * 1e3
print(f"fresh pipelined:  per-call {per:8.2f} ms")
