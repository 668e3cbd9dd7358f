import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics.model import PhysicsState
import importlib
stepmod = importlib.import_module('judo_tpu.physics.step')
from judo_tpu.physics.pallas_step import rollout_lanes
from judo_tpu.physics import make_state, rollout

task = LeapCube()
pm = task.planning_model  # f32
rng = np.random.default_rng(0)
R, T = 8, 50
qpos = np.tile(np.asarray(QPOS_HOME, np.float32), (R,1))
qvel = np.zeros((R, pm.nv), np.float32)
ctrl = (np.asarray(QPOS_HOME[7:], np.float32) + 0.05*rng.standard_normal((R, T, 16))).astype(np.float32)

t0=time.time()
lo = jax.jit(lambda a,b,c: rollout_lanes(pm, a, b, c, backend="xla"))(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
jax.block_until_ready(lo.states)
print("lane xla rollout compile+run", time.time()-t0, flush=True)

t0=time.time()
def one(qp, qv, c):
    return rollout(pm, make_state(pm, qpos=qp, qvel=qv), c, reseed_every=1)
ro = jax.jit(jax.vmap(one))(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
jax.block_until_ready(ro.states)
print("ref rollout compile+run", time.time()-t0, flush=True)

es = np.abs(np.asarray(ro.states) - np.asarray(lo.states))
esen = np.abs(np.asarray(ro.sensordata) - np.asarray(lo.sensordata))
print("finite:", bool(jnp.all(jnp.isfinite(lo.states))), flush=True)
for t in (0, 9, 24, 49):
    print(f"t={t:3d} states maxerr {es[:,t].max():.3e}  sens {esen[:,t].max():.3e}", flush=True)
