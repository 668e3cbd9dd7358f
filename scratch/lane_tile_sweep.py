import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
import judo_tpu.physics.pallas_step as ps
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics.solver import num_constraint_rows

task = LeapCube()
pm = task.planning_model
rng = np.random.default_rng(0)
R, T = 320, 100
qpos = np.tile(np.asarray(QPOS_HOME, np.float32), (R, 1))
qvel = np.zeros((R, pm.nv), np.float32)
ctrl = (np.asarray(QPOS_HOME[7:], np.float32) + 0.05 * rng.standard_normal((R, T, 16))).astype(np.float32)
qp, qv, ct = jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)

for tile in (384, 192, 128):
    ps.LANE_TILE = tile
    ro = jax.jit(lambda a, b, c: ps.rollout_lanes(pm, a, b, c, iterations=8, backend="pallas"),
                 compiler_options=ps.LANE_COMPILER_OPTIONS)
    t0 = time.time()
    o = ro(qp, qv, ct); jax.block_until_ready(o.states)
    comp = time.time() - t0
    ts = []
    for _ in range(15):
        t0 = time.time(); jax.block_until_ready(ro(qp, qv, ct).states); ts.append(time.time() - t0)
    print(f"tile={tile}  iters=8  rollout p50 {np.median(ts)*1e3:8.2f} ms  compile {comp:5.1f}s  finite {bool(jnp.isfinite(o.states).all())}", flush=True)
