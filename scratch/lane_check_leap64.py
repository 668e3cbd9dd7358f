import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
import mujoco
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics import make_state, put_model, rollout
from judo_tpu.physics.pallas_step import rollout_lanes

task = LeapCube()
mj = task.model
pm = put_model(mj, dtype=jnp.float64)
rng = np.random.default_rng(0)
R, T = 4, 50
qpos = np.tile(np.asarray(QPOS_HOME, np.float64), (R,1))
qvel = np.zeros((R, pm.nv), np.float64)
ctrl = (np.asarray(QPOS_HOME[7:], np.float64) + 0.05*rng.standard_normal((R, T, 16)))

t0=time.time()
lo = jax.jit(lambda a,b,c: rollout_lanes(pm, a, b, c, backend="xla"))(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
jax.block_until_ready(lo.states)
print("lane xla compile+run", time.time()-t0, flush=True)

t0=time.time()
def one(qp, qv, c):
    return rollout(pm, make_state(pm, qpos=qp, qvel=qv), c, reseed_every=1)
ro = jax.jit(jax.vmap(one))(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
jax.block_until_ready(ro.states)
print("ref compile+run", time.time()-t0, flush=True)

es = np.abs(np.asarray(ro.states) - np.asarray(lo.states))
print("finite lane:", bool(jnp.all(jnp.isfinite(lo.states))), "finite ref:", bool(jnp.all(jnp.isfinite(ro.states))), flush=True)
for t in (0, 9, 24, 49):
    print(f"t={t:3d} maxerr {es[:,t].max():.3e}   |lane| {np.abs(np.asarray(lo.states)[:,t]).max():.3e}  |ref| {np.abs(np.asarray(ro.states)[:,t]).max():.3e}", flush=True)
