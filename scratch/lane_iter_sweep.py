import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics.pallas_step import rollout_lanes, LANE_COMPILER_OPTIONS
from judo_tpu.physics.solver import num_constraint_rows

task = LeapCube()
pm = task.planning_model
rng = np.random.default_rng(0)
R, T = 320, 100
qpos = np.tile(np.asarray(QPOS_HOME, np.float32), (R, 1))
qvel = np.zeros((R, pm.nv), np.float32)
ctrl = (np.asarray(QPOS_HOME[7:], np.float32) + 0.05 * rng.standard_normal((R, T, 16))).astype(np.float32)
qp, qv, ct = jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)

ref = None
for iters in (25, 12, 8):
    ro = jax.jit(lambda a, b, c, it=iters: rollout_lanes(pm, a, b, c, iterations=it, backend="pallas"),
                 compiler_options=LANE_COMPILER_OPTIONS)
    t0 = time.time()
    o = ro(qp, qv, ct); jax.block_until_ready(o.states)
    compile_s = time.time() - t0
    ts = []
    for _ in range(15):
        t0 = time.time(); jax.block_until_ready(ro(qp, qv, ct).states); ts.append(time.time() - t0)
    p50 = np.median(ts) * 1e3
    if ref is None:
        ref = np.asarray(o.states)
        err = 0.0
    else:
        err = float(np.abs(np.asarray(o.states) - ref).max())
    print(f"iters={iters:3d}  rollout p50 {p50:8.2f} ms  compile {compile_s:5.1f}s  maxdiff_vs_25 {err:.3e}", flush=True)
