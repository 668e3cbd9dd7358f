import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices(), flush=True)
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics.pallas_step import rollout_lanes, _build_pallas_step, lane_supported
from judo_tpu.physics.solver import num_constraint_rows

task = LeapCube()
pm = task.planning_model
print("lane_supported:", lane_supported(pm), "nefc:", num_constraint_rows(pm), "iters:", pm.solver_iterations, flush=True)
dtype = pm.qpos0.dtype
print("dtype", dtype, flush=True)

rng = np.random.default_rng(0)
R, T = 320, 100
qpos = np.tile(np.asarray(jax.device_get(pm.qpos0)), (R,1)).astype(np.float32)
qpos[:] = np.asarray(QPOS_HOME, np.float32)
qvel = np.zeros((R, pm.nv), np.float32)
ctrl = (np.tile(np.asarray(QPOS_HOME[7:], np.float32), (R, T, 1)) + 0.05*rng.standard_normal((R, T, 16))).astype(np.float32)

# 1) single pallas step, B=128
step_fn = _build_pallas_step(pm, None, interpret=False)
qp = jnp.asarray(qpos[:128].T); qv = jnp.asarray(qvel[:128].T)
ct = jnp.asarray(ctrl[:128,0].T); f0 = jnp.zeros((num_constraint_rows(pm), 128), jnp.float32)
one = jax.jit(lambda a,b,c,d: step_fn(a,b,c,d))
t0=time.time()
out = one(qp, qv, ct, f0); jax.block_until_ready(out)
print(f"single pallas step compile {time.time()-t0:.1f}s", flush=True)
ts=[]
for _ in range(50):
    t0=time.time(); jax.block_until_ready(one(qp, qv, ct, f0)); ts.append(time.time()-t0)
print(f"single step (B=128) p50 {np.median(ts)*1e3:.3f} ms", flush=True)
print("finite:", [bool(jnp.all(jnp.isfinite(o))) for o in out], flush=True)

# 2) full rollout R=320 T=100
from judo_tpu.physics.pallas_step import LANE_COMPILER_OPTIONS
ro = jax.jit(lambda a,b,c: rollout_lanes(pm, a, b, c, backend="pallas"),
             compiler_options=LANE_COMPILER_OPTIONS)
t0=time.time()
o = ro(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)); jax.block_until_ready(o.states)
print(f"rollout compile {time.time()-t0:.1f}s", flush=True)
ts=[]
for _ in range(20):
    t0=time.time(); jax.block_until_ready(ro(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)).states)
    ts.append(time.time()-t0)
print(f"rollout R=320 T=100 p50 {np.median(ts)*1e3:.2f} ms  ({320*100/np.median(ts):.0f} steps/s)", flush=True)
print("states finite:", bool(jnp.all(jnp.isfinite(o.states))), flush=True)
