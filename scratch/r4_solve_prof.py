"""Where does the solve spend time beyond the rollout? Pipelined fresh-arg
probes of (a) the pure jitted solve, (b) solve minus trace-packing, and the
controller's host loop overhead."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

np.random.seed(0)
from judo_tpu.controller import make_controller

c = make_controller("leap_cube", "mppi")
c.optimizer_cfg.num_rollouts = 320
c.controller_cfg.pipeline_depth = 1
c.time = 0.0

# (a) pure solve, pipelined, fresh state each call
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

def fresh_state(i):
    return x0 + 1e-4 * jnp.asarray(rng.standard_normal(x0.shape), c.dtype)

# pipelined: keep 2 in flight
outs = []
cc = carry
t0 = time.perf_counter()
N = 20
for i in range(N):
    cc, o = solve(cc, fresh_state(i), jnp.asarray(0.01 * i, c.dtype), task_params, opt_params, norm_params, meta, spline_ts, rollout_ts)
    outs.append(o.rewards)
    if len(outs) > 2:
        jax.block_until_ready(outs.pop(0))
jax.block_until_ready(outs)
per = (time.perf_counter() - t0) / N * 1e3
print(f"pure solve pipelined: {per:8.2f} ms/solve", flush=True)

# sequential blocking
ts = []
cc = carry
for i in range(10):
    t0 = time.perf_counter()
    cc, o = solve(cc, fresh_state(100 + i), jnp.asarray(0.01 * i, c.dtype), task_params, opt_params, norm_params, meta, spline_ts, rollout_ts)
    jax.block_until_ready(o.rewards)
    ts.append(time.perf_counter() - t0)
print(f"pure solve blocking:  {np.median(ts)*1e3:8.2f} ms/solve", flush=True)

# (b) controller loop (what bench measures), for comparison
for _ in range(3):
    c.update_action()
c.flush_pipeline()
ts = []
for i in range(15):
    c.current_state = np.asarray(x0) + 1e-4 * rng.standard_normal(x0.shape)
    t0 = time.perf_counter()
    c.update_action()
    ts.append(time.perf_counter() - t0)
c.flush_pipeline()
print(f"controller loop:      {np.median(ts)*1e3:8.2f} ms/solve  split {c.last_plan_timing}", flush=True)
