"""A/B: SAT-stacked narrowphase effect + tile width + iters, robust timing."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

float(np.asarray(jnp.asarray(0.01)))

import judo_tpu.physics.pallas_step as ps
from judo_tpu.physics.pallas_step import LANE_COMPILER_OPTIONS, rollout_lanes
from judo_tpu.tasks.leap_cube import LeapCube

task = LeapCube()
pm = task.planning_model
R, T = 320, 100
rng = np.random.default_rng(0)
warm = np.asarray(task.optimizer_warm_start(), np.float32)
qp0 = jnp.asarray(np.tile(np.asarray(task.data.qpos, np.float32), (R, 1)))
qv0 = jnp.zeros((R, pm.nv), jnp.float32)
ct = jnp.asarray(warm[None, None] + 0.05 * rng.standard_normal((R, T, pm.nu)).astype(np.float32))


def with_tile(cap, iters):
    def f(a, b, c):
        old = ps.pick_lane_tile
        ps.pick_lane_tile = lambda B, cap_=cap: cap_ if B % cap_ == 0 else 128
        try:
            return rollout_lanes(pm, a, b, c, iterations=iters)
        finally:
            ps.pick_lane_tile = old
    return jax.jit(f, compiler_options=LANE_COMPILER_OPTIONS)


cands = {
    "t128@10": with_tile(128, 10),
    "t384@10": with_tile(384, 10),
    "t128@8": with_tile(128, 8),
}
fns = {}
for name, fn in cands.items():
    t0 = time.perf_counter()
    jax.block_until_ready(fn(qp0, qv0, ct).states)
    print(f"[compile {name}: {time.perf_counter()-t0:.1f}s]", flush=True)
    fns[name] = fn
results = {name: [] for name in cands}
K = 10
for _ in range(5):
    for name, fn in fns.items():
        t0 = time.perf_counter()
        outs = [fn(qp0, qv0, ct) for _ in range(K)]
        jax.block_until_ready(outs[-1].states)
        results[name].append((time.perf_counter() - t0) / K * 1e3)
for name, ts in results.items():
    print(f"{name:10s} min {min(ts):7.2f}  med {np.median(ts):7.2f} ms/call", flush=True)
