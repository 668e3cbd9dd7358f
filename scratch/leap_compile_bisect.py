import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics import make_state
from judo_tpu.physics.step import step_with_forward, forward
import dataclasses

task = LeapCube()
pm = task.planning_model
x0 = make_state(pm, qpos=QPOS_HOME)
ctrl = jnp.asarray(QPOS_HOME[7:], jnp.float32)

def t(name, fn, *args):
    t0 = time.time(); out = fn(*args); jax.block_until_ready(out)
    print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time(); out = fn(*args); jax.block_until_ready(out)
    print(f"  steady {1e3*(time.time()-t0):.1f} ms", flush=True)

# 1. single step, contacts on
t("single step (contacts)", jax.jit(lambda s, c: step_with_forward(pm, s, c)[0].qpos), x0, ctrl)
# 2. single step, no contacts
pm_nc = dataclasses.replace(pm, contact_enabled=False, limit_enabled=False)
t("single step (smooth only)", jax.jit(lambda s, c: step_with_forward(pm_nc, s, c)[0].qpos), x0, ctrl)
# 3. batched single step R=32
t("batched step R=32 (contacts)", jax.jit(jax.vmap(lambda s, c: step_with_forward(pm, s, c)[0].qpos, in_axes=(None, 0))), x0, jnp.tile(ctrl, (32, 1)))
