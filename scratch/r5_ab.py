"""Robust A/B timing on the pooled TPU: candidates interleaved round-robin,
block-once batches, MIN across trials (least-contended estimate)."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

float(np.asarray(jnp.asarray(0.01)))  # real transport mode

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


def bench_many(cands: dict, trials: int = 5, K: int = 10) -> None:
    fns = {}
    for name, fn in cands.items():
        t0 = time.perf_counter()
        jax.block_until_ready(jax.tree.leaves(fn(qp0, qv0, ct))[0])
        print(f"[compile {name}: {time.perf_counter()-t0:.1f}s]", flush=True)
        fns[name] = fn
    results = {name: [] for name in cands}
    for _ in range(trials):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            outs = [fn(qp0, qv0, ct) for _ in range(K)]
            jax.block_until_ready(jax.tree.leaves(outs[-1])[0])
            results[name].append((time.perf_counter() - t0) / K * 1e3)
    for name, ts in results.items():
        print(f"{name:24s} min {min(ts):7.2f}  med {np.median(ts):7.2f} ms/call  {['%.1f'%t for t in ts]}", flush=True)


if __name__ == "__main__":
    cands = {
        "iters10": jax.jit(lambda a, b, c: rollout_lanes(pm, a, b, c, iterations=10), compiler_options=LANE_COMPILER_OPTIONS),
        "iters5": jax.jit(lambda a, b, c: rollout_lanes(pm, a, b, c, iterations=5), compiler_options=LANE_COMPILER_OPTIONS),
        "iters20": jax.jit(lambda a, b, c: rollout_lanes(pm, a, b, c, iterations=20), compiler_options=LANE_COMPILER_OPTIONS),
    }
    bench_many(cands)
