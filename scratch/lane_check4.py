import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
import mujoco
from judo_tpu.physics import put_model, make_state, rollout
from judo_tpu.physics.pallas_step import rollout_lanes, lane_supported

XML = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1"/>
    <body name="link1" pos="0 0 0.25">
      <joint name="j1" type="hinge" axis="0 1 0" range="-1.5 1.5" damping="0.2"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04" mass="0.5"/>
      <body name="link2" pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" range="-2 2" damping="0.1"/>
        <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.035" mass="0.3"/>
      </body>
    </body>
    <body name="box" pos="0.45 0 0.08">
      <freejoint/>
      <geom type="box" size="0.06 0.06 0.06" mass="0.2"/>
    </body>
  </worldbody>
  <actuator>
    <position joint="j1" kp="30" ctrlrange="-1.5 1.5"/>
    <position joint="j2" kp="20" ctrlrange="-2 2"/>
  </actuator>
  <sensor>
    <framepos name="trace_box" objtype="xbody" objname="box"/>
  </sensor>
</mujoco>
"""
mj = mujoco.MjModel.from_xml_string(XML)
pm = put_model(mj, dtype=jnp.float64)
print("lane_supported:", lane_supported(pm), flush=True)
rng = np.random.default_rng(2)
R, T = 6, 40
qpos = np.tile(np.asarray(jax.device_get(pm.qpos0)), (R,1))
qvel = 0.2*rng.standard_normal((R, pm.nv))
base = np.array([-0.4, -0.6])
ctrl = base + 0.2*np.sin(0.1*np.arange(T))[None,:,None] + 0.05*rng.standard_normal((R, T, 2))

# reference: vmapped rollout — but it uses NS-carried inverses + blocked reseed.
# For exact comparison use reseed_every=1 (exact inverses every block of 1).
def one(qp, qv, c):
    return rollout(pm, make_state(pm, qpos=qp, qvel=qv), c, reseed_every=1)
ro = jax.jit(jax.vmap(one))(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))

t0 = time.time()
lo = jax.jit(lambda a,b,c: rollout_lanes(pm, a, b, c, backend="xla"))(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
print("xla lane rollout compile+run", time.time()-t0, flush=True)

es = np.abs(np.asarray(ro.states) - np.asarray(lo.states)).max()
esen = np.abs(np.asarray(ro.sensordata) - np.asarray(lo.sensordata)).max()
print(f"states err {es:.3e} sensors err {esen:.3e}", "OK" if es < 1e-6 and esen < 1e-6 else "FAIL", flush=True)

# pallas interpret backend (plumbing check, small batch padded to 128)
t0 = time.time()
li = jax.jit(lambda a,b,c: rollout_lanes(pm, a, b, c, backend="interpret"))(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
print("interpret compile+run", time.time()-t0, flush=True)
ei = np.abs(np.asarray(li.states) - np.asarray(lo.states)).max()
print(f"interpret vs xla err {ei:.3e}", "OK" if ei < 1e-10 else "FAIL", flush=True)
