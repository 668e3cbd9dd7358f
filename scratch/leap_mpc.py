import sys, time; sys.path.insert(0, "/root/repo")
import numpy as np
# run on TPU (ambient): big compile but fast steady state
import jax
from judo_tpu.controller import make_controller
from judo_tpu.app.structs import MujocoState
import mujoco

np.random.seed(0)
c = make_controller("leap_cube", "mppi")
print("opt cfg:", c.optimizer_cfg, flush=True)
print("ctrl cfg:", c.controller_cfg, flush=True)
task = c.task
d = task.data
t0 = time.time()
c.update_action()
print(f"first solve (compile): {time.time()-t0:.1f}s", flush=True)

angle_err = lambda: 2*np.arccos(np.clip(abs(np.dot(d.qpos[3:7], task.goal_quat)), 0, 1))
print("initial angle err:", angle_err(), flush=True)
sim_per_plan = max(1, int(1.0 / (c.controller_cfg.control_freq * task.dt)))
times = []
for i in range(150):
    c.update_states(MujocoState(d.time, d.qpos.copy(), d.qvel.copy(), None, None, None, None, task.get_sim_metadata()))
    t0 = time.time(); c.update_action(); times.append(time.time()-t0)
    for _ in range(sim_per_plan):
        d.ctrl[:] = c.action(d.time)
        task.pre_sim_step(); mujoco.mj_step(task.model, d); task.post_sim_step()
    if i % 25 == 0:
        print(f"i={i} t={d.time:.2f} cube z={d.qpos[2]:.3f} angle_err={angle_err():.3f} plan={times[-1]*1e3:.0f}ms best_r={c.rewards.max():.2f}", flush=True)
print(f"plan p50: {np.median(times)*1e3:.1f} ms; final angle err {angle_err():.3f}; cube z {d.qpos[2]:.3f}", flush=True)
