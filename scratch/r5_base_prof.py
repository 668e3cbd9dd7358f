"""Round-5 ground truth after the cone fix: (a) fused rollout alone at the
production shape (B=384 incl. pad, T=100, iters=10), (b) pure pipelined solve."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

np.random.seed(0)
from judo_tpu.physics.pallas_step import rollout_lanes, LANE_COMPILER_OPTIONS
from judo_tpu.tasks.leap_cube import LeapCube

print("devices:", jax.devices(), flush=True)
task = LeapCube()
pm = task.planning_model
R, T = 320, 100
rng = np.random.default_rng(0)
warm = np.asarray(task.optimizer_warm_start(), np.float32)
qp0 = jnp.asarray(np.tile(task.data.qpos, (R, 1)), jnp.float32)
qv0 = jnp.zeros((R, pm.nv), jnp.float32)
ct = jnp.asarray(warm[None, None] + 0.05 * rng.standard_normal((R, T, pm.nu)), jnp.float32)

roll = jax.jit(
    lambda a, b, c: rollout_lanes(pm, a, b, c, iterations=10),
    compiler_options=LANE_COMPILER_OPTIONS,
)
t0 = time.perf_counter()
out = roll(qp0, qv0, ct)
jax.block_until_ready(out.states)
print(f"fused rollout compile {time.perf_counter()-t0:.1f}s", flush=True)
print("finite:", bool(jnp.isfinite(out.states).all()), flush=True)
ts = []
for _ in range(20):
    t0 = time.perf_counter()
    jax.block_until_ready(roll(qp0, qv0, ct).states)
    ts.append(time.perf_counter() - t0)
print(f"fused rollout R={R} T={T} iters=10 p50 {np.median(ts)*1e3:8.2f} ms", flush=True)

# (b) pure solve through the controller
from judo_tpu.controller import make_controller

c = make_controller("leap_cube", "mppi")
c.optimizer_cfg.num_rollouts = 320
c.time = 0.0
solve = c._get_solve()
task_params, opt_params, norm_params = c._device_params()
spline_ts, rollout_ts = c._device_times()
meta = {k: jnp.asarray(v, c.dtype) for k, v in c.task.pre_rollout(c.current_state).items()}
x0 = jnp.asarray(c.current_state, c.dtype)
carry = c._carry
t0 = time.perf_counter()
carry1, out = solve(carry, x0, jnp.asarray(0.0, c.dtype), task_params, opt_params, norm_params, meta, spline_ts, rollout_ts)
jax.block_until_ready(out.rewards)
print(f"solve compile {time.perf_counter()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)

# depth-0 (sync every call)
cc = carry
ts = []
for i in range(30):
    x = x0 + 1e-4 * jnp.asarray(rng.standard_normal(x0.shape), c.dtype)
    t0 = time.perf_counter()
    cc, o = solve(cc, x, jnp.asarray(0.01 * i, c.dtype), task_params, opt_params, norm_params, meta, spline_ts, rollout_ts)
    jax.block_until_ready(o.rewards)
    ts.append(time.perf_counter() - t0)
print(f"pure solve depth-0 p50 {np.median(ts)*1e3:8.2f} ms", flush=True)

# pipelined depth-2
outs = []
cc = carry
ts = []
for i in range(40):
    x = x0 + 1e-4 * jnp.asarray(rng.standard_normal(x0.shape), c.dtype)
    t0 = time.perf_counter()
    cc, o = solve(cc, x, jnp.asarray(0.01 * i, c.dtype), task_params, opt_params, norm_params, meta, spline_ts, rollout_ts)
    outs.append(o.rewards)
    if len(outs) > 2:
        jax.block_until_ready(outs.pop(0))
    ts.append(time.perf_counter() - t0)
jax.block_until_ready(outs)
print(f"pure solve depth-2 p50 {np.median(ts)*1e3:8.2f} ms", flush=True)
