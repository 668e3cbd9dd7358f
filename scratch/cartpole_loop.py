"""Scratch: closed-loop cartpole MPC with the TPU-native controller (on CPU)."""
import sys, time as pytime

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import mujoco
import numpy as np

from judo_tpu.controller import make_controller
from judo_tpu.app.structs import MujocoState

np.random.seed(0)
c = make_controller("cartpole", "ps")
print("controller:", c.optimizer_cfg, c.controller_cfg)

task = c.task
d = task.data
d.qpos[:] = [1.0, np.pi]  # hanging, offset cart
d.qvel[:] = 0
mujoco.mj_forward(task.model, d)

sim_steps_per_plan = max(1, int(1.0 / (c.controller_cfg.control_freq * task.dt)))
print("T:", c.num_timesteps, "sim steps/plan:", sim_steps_per_plan)

t0 = pytime.perf_counter()
for i in range(400):
    c.update_states(MujocoState(d.time, d.qpos.copy(), d.qvel.copy(), None, None, None, None, {}))
    tp0 = pytime.perf_counter()
    c.update_action()
    plan_ms = (pytime.perf_counter() - tp0) * 1e3
    for _ in range(sim_steps_per_plan):
        d.ctrl[:] = c.action(d.time)
        mujoco.mj_step(task.model, d)
    if i % 50 == 0:
        print(f"t={d.time:5.2f} qpos={np.round(d.qpos, 3)} best_reward={c.rewards.max():9.2f} plan={plan_ms:7.1f}ms")
print("total", pytime.perf_counter() - t0, "s; final qpos", d.qpos, "(want cart~0, pole~0 mod 2pi)")
cos_pole = np.cos(d.qpos[1])
print("cos(pole angle) =", cos_pole, "(1.0 = upright)")
assert abs(d.qpos[0]) < 0.5 and cos_pole > 0.9, "cartpole did not balance"
print("BALANCED OK; traces shape:", None if c.traces is None else c.traces.shape)
