import sys, time; sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
np.random.seed(0)
from judo_tpu.controller import Controller, ControllerConfig
from judo_tpu.optimizers import PredictiveSampling, PredictiveSamplingConfig
from judo_tpu.tasks import SpotTireUpright, get_registered_tasks

assert "spot_tire_upright" in get_registered_tasks(), "task not registered"
task = SpotTireUpright()
opt = PredictiveSampling(PredictiveSamplingConfig(num_rollouts=4, num_nodes=3), task.nu)
cc = ControllerConfig(horizon=0.12, spline_order="linear")
c = Controller(cc, task, opt)
print("nu:", c.task.nu, "uses_policy:", task.uses_locomotion_policy, flush=True)
assert c.task.nu == 17
t0 = time.time()
for i in range(2):
    c.update_action()
    print(f"step {i}: t={time.time()-t0:.0f}s rewards p50={np.median(c.rewards):.1f} best={c.rewards.max():.1f} finite={np.isfinite(c.rewards).all()}", flush=True)
a = c.action(c.time + 0.05)
print("action(t+0.05) head:", np.round(a[:6], 3), flush=True)
print("success (tire flat at reset, expect False):", c.task.success(), flush=True)
print("TIRE UPRIGHT VERIFY OK", flush=True)
