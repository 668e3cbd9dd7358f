"""A/B: fused whole-rollout kernel vs scan-of-step kernels, leap bench shape."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from judo_tpu.physics.pallas_step import LANE_COMPILER_OPTIONS, rollout_lanes
from judo_tpu.tasks import get_registered_tasks

task_cls, _ = get_registered_tasks()["leap_cube"]
task = task_cls()
pm = task.planning_model
R, T = 320, 100
rng = np.random.default_rng(0)
qp = jnp.asarray(np.tile(task.data.qpos, (R, 1)), jnp.float32)
qv = jnp.asarray(np.zeros((R, pm.nv)), jnp.float32)
mid = jnp.asarray(0.5 * (task.actuator_ctrlrange[:, 0] + task.actuator_ctrlrange[:, 1]), jnp.float32)
ct = mid + jnp.asarray(0.1 * rng.standard_normal((R, T, pm.nu)), jnp.float32)

fused = jax.jit(
    lambda a, b, c: rollout_lanes(pm, a, b, c, backend="pallas"),
    compiler_options=LANE_COMPILER_OPTIONS,
)
t0 = time.perf_counter()
out = fused(qp, qv, ct)
jax.block_until_ready(out)
print(f"fused compile {time.perf_counter()-t0:.1f}s")
print("finite:", bool(jnp.all(jnp.isfinite(out.states))))
ts = []
for _ in range(20):
    t0 = time.perf_counter()
    jax.block_until_ready(fused(qp, qv, ct))
    ts.append(time.perf_counter() - t0)
p50 = np.median(ts) * 1e3
print(f"fused rollout R={R} T={T} p50 {p50:8.2f} ms  ({R*T/np.median(ts):,.0f} steps/s)")
