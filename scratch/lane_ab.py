import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics.pallas_step import rollout_lanes, LANE_COMPILER_OPTIONS

task = LeapCube()
pm = task.planning_model
rng = np.random.default_rng(0)
R, T = 320, 100
qp = jnp.asarray(np.tile(np.asarray(QPOS_HOME, np.float32), (R, 1)))
qv = jnp.zeros((R, pm.nv), jnp.float32)
ct = jnp.asarray((np.asarray(QPOS_HOME[7:], np.float32) + 0.05 * rng.standard_normal((R, T, 16))).astype(np.float32))

def bench(iters):
    ro = jax.jit(lambda a, b, c: rollout_lanes(pm, a, b, c, iterations=iters, backend="pallas"),
                 compiler_options=LANE_COMPILER_OPTIONS)
    t0 = time.time(); o = ro(qp, qv, ct); jax.block_until_ready(o.states); comp = time.time() - t0
    ts = []
    for _ in range(20):
        t0 = time.perf_counter(); jax.block_until_ready(ro(qp, qv, ct).states); ts.append(time.perf_counter() - t0)
    print(f"iters={iters:3d}: p50 {np.median(ts)*1e3:8.2f} ms  min {min(ts)*1e3:8.2f}  compile {comp:5.1f}s", flush=True)

bench(8)
bench(25)
bench(8)  # drift check
