"""CLEAN-mode device time of the real leap fused rollout: zero d2h before or
during the measurement (numpy model constants make the trace transfer-free);
one block at the very end gives total/K."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from judo_tpu.physics.pallas_step import LANE_COMPILER_OPTIONS, rollout_lanes
from judo_tpu.tasks.leap_cube import LeapCube

task = LeapCube()
pm = task.planning_model
R, T = 320, 100
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
rng = np.random.default_rng(0)
warm = np.asarray(task.optimizer_warm_start(), np.float32)
qp0 = jnp.asarray(np.tile(np.asarray(task.data.qpos, np.float32), (R, 1)))
qv0 = jnp.zeros((R, pm.nv), jnp.float32)
ct = jnp.asarray(warm[None, None] + 0.05 * rng.standard_normal((R, T, pm.nu)).astype(np.float32))

roll = jax.jit(
    lambda a, b, c: rollout_lanes(pm, a, b, c, iterations=ITERS),
    compiler_options=LANE_COMPILER_OPTIONS,
)
# warm compile; do NOT touch outputs on host
out = roll(qp0, qv0, ct)
t0 = time.perf_counter()
while not out.states.is_ready():
    time.sleep(0.02)
print(f"compile+first {time.perf_counter()-t0:.1f}s (is_ready poll — no d2h)", flush=True)

K = 30
t0 = time.perf_counter()
outs = [roll(qp0, qv0, ct) for _ in range(K)]
while not outs[-1].states.is_ready():
    time.sleep(0.001)
per = (time.perf_counter() - t0) / K * 1e3
print(f"CLEAN fused rollout iters={ITERS}: {per:8.2f} ms/call (K={K}, block-free)", flush=True)

# now force degraded mode and repeat
float(np.asarray(jnp.asarray(0.01)))
t0 = time.perf_counter()
outs = [roll(qp0, qv0, ct) for _ in range(K)]
while not outs[-1].states.is_ready():
    time.sleep(0.001)
per = (time.perf_counter() - t0) / K * 1e3
print(f"DEGRADED fused rollout iters={ITERS}: {per:8.2f} ms/call", flush=True)
