"""Which rollout produces NaNs on the synthetic bench inputs, and when?"""
import sys

sys.path.insert(0, "/root/repo")

import importlib

import jax
import jax.numpy as jnp
import numpy as np

from judo_tpu.tasks import get_registered_tasks
from judo_tpu.physics.model import PhysicsState

stepmod = importlib.import_module("judo_tpu.physics.step")

B, T = 320, 100
task_cls, _ = get_registered_tasks()["leap_cube"]
m = task_cls().planning_model

rng = np.random.default_rng(0)
qpos = (np.tile(np.asarray(m.qpos0), (B, 1)) + 0.01 * rng.standard_normal((B, m.nq))).astype(np.float32)
qvel = (0.01 * rng.standard_normal((B, m.nv))).astype(np.float32)
s0 = PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel), time=jnp.zeros(B, jnp.float32))
ctrl = jnp.asarray(rng.standard_normal((B, T, m.nu)).astype(np.float32) * 0.1)


def rollout_cold(s, c):
    from judo_tpu.physics.solver import num_constraint_rows

    nefc = num_constraint_rows(m)

    def body(carry, ctrl_t):
        s, f = carry
        s, res, _ = stepmod.step_with_forward(m, s, ctrl_t, f)
        return (s, res.efc_force), jnp.concatenate([s.qpos, s.qvel])

    f0 = jnp.zeros(nefc, s.qpos.dtype)
    return jax.lax.scan(body, (s, f0), c)[1]


ro_cold = jax.jit(jax.vmap(rollout_cold, in_axes=(0, 0)))
ro_ns = jax.jit(jax.vmap(lambda s, c: stepmod.rollout(m, s, c).states, in_axes=(0, 0)))

a = np.asarray(ro_cold(s0, ctrl))  # (B, T, nq+nv)
b = np.asarray(ro_ns(s0, ctrl))
for name, x in [("cold", a), ("ns", b)]:
    bad = ~np.isfinite(x)
    nbad_traj = int(bad.any(axis=(1, 2)).sum())
    first_t = int(np.argmax(bad.any(axis=(0, 2)))) if bad.any() else -1
    print(f"{name}: nan trajs {nbad_traj}/{B}, first bad t={first_t}, max finite {np.nanmax(np.abs(np.where(bad, np.nan, x))):.3e}", flush=True)
both = np.isfinite(a) & np.isfinite(b)
print("max |diff| where both finite:", float(np.max(np.abs(np.where(both, a - b, 0.0)))), flush=True)
