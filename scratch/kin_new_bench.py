import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics import lane_engine as le
from judo_tpu.physics.pallas_step import rollout_lanes, LANE_COMPILER_OPTIONS

task = LeapCube()
pm = task.planning_model
B, T, LT = 384, 100, 128
dt = jnp.float32

def kernel(qp_ref, oq_ref):
    kin = le.kinematics_l(pm, qp_ref[:])
    acc = sum(jnp.sum(x, axis=0) for x in kin.site_xpos) + sum(
        jnp.sum(x.reshape(9, -1), axis=0) for x in kin.ximat) + sum(
        jnp.sum(x, axis=0) for x in kin.geom_xpos)
    oq_ref[:] = qp_ref[:] + 1e-12 * acc[None]

def pcall(qp):
    return pl.pallas_call(
        kernel, grid=(B // LT,),
        in_specs=[pl.BlockSpec((pm.nq, LT), lambda i: (0, i))],
        out_specs=pl.BlockSpec((pm.nq, LT), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((pm.nq, B), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )(qp)

run = jax.jit(lambda qp: jax.lax.scan(lambda c, _: (pcall(c), None), qp, None, length=T)[0],
              compiler_options=LANE_COMPILER_OPTIONS)
qp0 = jnp.asarray(np.tile(np.asarray(QPOS_HOME, np.float32), (B, 1)).T)
t0 = time.time(); jax.block_until_ready(run(qp0)); comp = time.time()-t0
ts = []
for _ in range(15):
    t0 = time.perf_counter(); jax.block_until_ready(run(qp0)); ts.append(time.perf_counter()-t0)
print(f"NEW tuple full-kin: {np.median(ts)*1e6/T:8.1f} us/step  compile {comp:.1f}s", flush=True)

# full rollout with iters=8
rng = np.random.default_rng(0)
R = 320
qpos = np.tile(np.asarray(QPOS_HOME, np.float32), (R,1))
qvel = np.zeros((R, pm.nv), np.float32)
ctrl = (np.asarray(QPOS_HOME[7:], np.float32) + 0.05*rng.standard_normal((R, T, 16))).astype(np.float32)
ro = jax.jit(lambda a,b,c: rollout_lanes(pm, a, b, c, iterations=8, backend="pallas"),
             compiler_options=LANE_COMPILER_OPTIONS)
t0=time.time(); o = ro(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)); jax.block_until_ready(o.states)
comp = time.time()-t0
ts=[]
for _ in range(15):
    t0=time.perf_counter(); jax.block_until_ready(ro(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)).states); ts.append(time.perf_counter()-t0)
print(f"FULL rollout R=320 T=100 iters=8: p50 {np.median(ts)*1e3:.2f} ms  compile {comp:.1f}s  finite {bool(jnp.isfinite(o.states).all())}", flush=True)
