"""Round-4 profiling: where do the 117.9 ms of the leap_cube+mppi solve go?

Stages measured, all jitted on TPU at bench shapes (R=320, T=100):
  A. full solve (controller.update_action device portion)
  B. rollout_lanes alone (pallas backend)
  C. solve minus rollout (rollout replaced by broadcasting x0)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

np.random.seed(0)

from judo_tpu.controller import make_controller
from judo_tpu.physics.pallas_step import LANE_COMPILER_OPTIONS, rollout_lanes

TASK, OPT = "leap_cube", "mppi"
R = 320


def timeit(fn, *args, n=20, warmup=2):
    t_c0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t_c0
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3), compile_s


c = make_controller(TASK, OPT)
c.optimizer_cfg.num_rollouts = R
c.time = 0.0

# A. full solve
for _ in range(3):
    c.update_action()
    jax.block_until_ready(c.last_outputs.rewards)
ts = []
for _ in range(20):
    t0 = time.perf_counter()
    c.update_action()
    jax.block_until_ready(c.last_outputs.rewards)
    ts.append(time.perf_counter() - t0)
print(f"A. full update_action        p50 {np.median(ts)*1e3:8.2f} ms")
print(f"   last timing split: {c.last_plan_timing}")

pm = c.pm
T = c.num_timesteps
print(f"   shapes: R={R} T={T} nq={pm.nq} nv={pm.nv} nu={pm.nu} substeps={c.task.physics_substeps}")

# B. rollout alone
qp0 = jnp.broadcast_to(jnp.asarray(c.task.data.qpos, jnp.float32), (R, pm.nq))
qv0 = jnp.broadcast_to(jnp.asarray(c.task.data.qvel, jnp.float32), (R, pm.nv))
ctrl = jnp.asarray(np.random.randn(R, T, pm.nu) * 0.1, jnp.float32)

roll = jax.jit(
    lambda qp, qv, ct: rollout_lanes(pm, qp, qv, ct, physics_substeps=c.task.physics_substeps),
    compiler_options=LANE_COMPILER_OPTIONS,
)
ms, cs = timeit(roll, qp0, qv0, ctrl)
print(f"B. rollout_lanes (pallas)    p50 {ms:8.2f} ms   compile {cs:.1f}s")

# C. solve with rollout stubbed out: monkeypatch rollout_lanes to identity
import judo_tpu.physics.pallas_step as ps_mod
from judo_tpu.physics.pallas_step import LaneRolloutOutput

_real = ps_mod.rollout_lanes

def _stub(m, qpos0, qvel0, controls, physics_substeps=1, iterations=None, backend="pallas", lipschitz="holder"):
    Rr, Tt = controls.shape[0], controls.shape[1]
    st = jnp.broadcast_to(
        jnp.concatenate([qpos0, qvel0], axis=-1)[:, None, :], (Rr, Tt, m.nq + m.nv)
    ) + 0.0 * controls.sum(axis=-1)[..., None]
    sens = jnp.zeros((Rr, Tt, m.nsensordata), qpos0.dtype)
    return LaneRolloutOutput(states=st, sensordata=sens)

import judo_tpu.controller.controller as cmod

ps_mod.rollout_lanes = _stub
cmod_backup = None
c2 = make_controller(TASK, OPT)
c2.optimizer_cfg.num_rollouts = R
c2.time = 0.0
for _ in range(3):
    c2.update_action()
    jax.block_until_ready(c2.last_outputs.rewards)
ts = []
for _ in range(20):
    t0 = time.perf_counter()
    c2.update_action()
    jax.block_until_ready(c2.last_outputs.rewards)
    ts.append(time.perf_counter() - t0)
print(f"C. solve w/ stubbed rollout  p50 {np.median(ts)*1e3:8.2f} ms")
print(f"   split: {c2.last_plan_timing}")
ps_mod.rollout_lanes = _real
