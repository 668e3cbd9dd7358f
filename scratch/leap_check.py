import sys, time; sys.path.insert(0, "/root/repo")
import os; os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import mujoco, numpy as np
from judo_tpu.models.leap import leap_cube_xml_path
p = leap_cube_xml_path()
m = mujoco.MjModel.from_xml_path(p)
print("compiled: nq", m.nq, "nv", m.nv, "nu", m.nu, "nbody", m.nbody, "ngeom", m.ngeom, "nsensordata", m.nsensordata, flush=True)
d = mujoco.MjData(m)
QPOS_HOME = np.array([0.0,0.03,0.1,1,0,0,0, 0.5,-0.75,0.75,0.25, 0.5,0.0,0.75,0.25, 0.5,0.75,0.75,0.25, 0.65,0.9,0.75,0.6])
d.qpos[:] = QPOS_HOME
d.ctrl[:] = QPOS_HOME[7:]
for i in range(200):
    mujoco.mj_step(m, d)
print("cube pos after 2s (mujoco):", np.round(d.qpos[:3], 4), " quat:", np.round(d.qpos[3:7], 3), flush=True)
print(("cube FELL" if d.qpos[2] < -0.1 else "cube held in hand"), flush=True)
from judo_tpu.physics import put_model, make_state, rollout
import jax.numpy as jnp
pm = put_model(m, solver_iterations=25)
from judo_tpu.physics.collision import num_contact_slots
print("collision pairs:", len(pm.collision_pairs), "contact slots:", num_contact_slots(pm), flush=True)
s0 = make_state(pm, qpos=QPOS_HOME)
T = 25
ctrl = jnp.tile(jnp.asarray(QPOS_HOME[7:], jnp.float32), (T, 1))
t0 = time.time()
f = jax.jit(lambda s, c: rollout(pm, s, c, unroll=1))
out = f(s0, ctrl)
jax.block_until_ready(out.states)
print(f"compile+run {time.time()-t0:.1f}s", flush=True)
st = np.asarray(out.states)
print("ours cube pos after 0.25s:", np.round(st[-1][:3], 4), "quat:", np.round(st[-1][3:7], 3), flush=True)
print("finite:", np.isfinite(st).all(), flush=True)
t0 = time.time(); out = f(s0, ctrl); jax.block_until_ready(out.states)
print(f"steady-state run: {(time.time()-t0)*1e3:.0f} ms", flush=True)
