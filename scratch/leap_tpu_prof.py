import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics import make_state, rollout

task = LeapCube()
pm = task.planning_model
R, T = 32, 100
ctrl = jnp.tile(jnp.asarray(QPOS_HOME[7:], jnp.float32), (R, T, 1))
x0 = make_state(pm, qpos=QPOS_HOME)

for unroll in (1, 2):
    f = jax.jit(lambda c, u=unroll: jax.vmap(lambda cc: rollout(pm, x0, cc, unroll=u))(c).states)
    t0 = time.time(); out = f(ctrl); jax.block_until_ready(out)
    print(f"unroll={unroll} compile+run {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(10):
        t0 = time.time(); out = f(ctrl); jax.block_until_ready(out); ts.append(time.time()-t0)
    print(f"  steady p50 {np.median(ts)*1e3:.1f} ms -> {R*T/np.median(ts):.0f} steps/s", flush=True)
