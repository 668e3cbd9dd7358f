"""Solver quality/time grid: single-step qacc accuracy of (iters, lipschitz)
vs a 100-iter holder reference on mid-rollout leap states, plus rollout p50."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics.pallas_step import rollout_lanes, _build_pallas_step, LANE_COMPILER_OPTIONS
from judo_tpu.physics.solver import num_constraint_rows

task = LeapCube()
pm = task.planning_model
nefc = num_constraint_rows(pm)
rng = np.random.default_rng(0)
R, T = 320, 100
B = 384
qp0 = jnp.asarray(np.tile(np.asarray(QPOS_HOME, np.float32), (R, 1)))
qv0 = jnp.zeros((R, pm.nv), jnp.float32)
ct = jnp.asarray((np.asarray(QPOS_HOME[7:], np.float32) + 0.05 * rng.standard_normal((R, T, 16))).astype(np.float32))

# mid-rollout states after 30 steps (reference config)
mid = jax.jit(lambda a, b, c: rollout_lanes(pm, a, b, c, iterations=25, backend="pallas"),
              compiler_options=LANE_COMPILER_OPTIONS)(qp0, qv0, ct[:, :30])
qp_mid = jnp.concatenate([mid.states[:, -1, :pm.nq], mid.states[-1:, -1, :pm.nq].repeat(B - R, 0)], 0).T
qv_mid = jnp.concatenate([mid.states[:, -1, pm.nq:], mid.states[-1:, -1, pm.nq:].repeat(B - R, 0)], 0).T
ct_mid = jnp.concatenate([ct[:, 30], ct[-1:, 30].repeat(B - R, 0)], 0).T
f0 = jnp.zeros((nefc, B), jnp.float32)

def one_step(iters, lips):
    fn = _build_pallas_step(pm, iters, interpret=False, lipschitz=lips)
    return jax.jit(lambda a, b, c, d: fn(a, b, c, d), compiler_options=LANE_COMPILER_OPTIONS)

ref = one_step(100, "holder")(qp_mid, qv_mid, ct_mid, f0)
qv_ref = ref[1]
dv_ref = qv_ref - qv_mid  # the step's velocity update (solver-dependent part)
scale = float(jnp.abs(dv_ref).max())
print(f"reference dv scale: {scale:.4f}", flush=True)

for iters, lips in [(25, "holder"), (12, "holder"), (8, "holder"), (12, "power"), (8, "power"), (6, "power")]:
    out = one_step(iters, lips)(qp_mid, qv_mid, ct_mid, f0)
    err = float(jnp.abs(out[1] - qv_ref).max()) / max(scale, 1e-9)
    print(f"iters={iters:3d} {lips:<7}: rel dv err {err:9.5f}", flush=True)

# rollout timings
for iters, lips in [(8, "holder"), (8, "power"), (12, "power")]:
    ro = jax.jit(lambda a, b, c, it=iters, lp=lips: rollout_lanes(pm, a, b, c, iterations=it, backend="pallas", lipschitz=lp),
                 compiler_options=LANE_COMPILER_OPTIONS)
    o = ro(qp0, qv0, ct); jax.block_until_ready(o.states)
    ts = []
    for _ in range(15):
        t0 = time.perf_counter(); jax.block_until_ready(ro(qp0, qv0, ct).states); ts.append(time.perf_counter() - t0)
    print(f"rollout iters={iters:3d} {lips:<7}: p50 {np.median(ts)*1e3:8.2f} ms  finite {bool(jnp.isfinite(o.states).all())}", flush=True)
