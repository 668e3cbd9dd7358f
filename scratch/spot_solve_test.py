import sys, time; sys.path.insert(0, "/root/repo")
import os; os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from judo_tpu.controller import Controller, ControllerConfig
from judo_tpu.optimizers import PredictiveSampling, PredictiveSamplingConfig
from judo_tpu.tasks import SpotNavigate

np.random.seed(0)
task = SpotNavigate()
task.config.goal_position = np.array([2.0, 0.0, 0.52])
opt = PredictiveSampling(PredictiveSamplingConfig(num_rollouts=4, num_nodes=3, sigma=0.1), task.nu)
cc = ControllerConfig(horizon=0.4, spline_order="linear")
c = Controller(cc, task, opt)
print("nu:", task.nu, "T:", c.num_timesteps, flush=True)
t0 = time.time()
c.update_action()
print(f"first spot solve (compile): {time.time()-t0:.1f}s; rewards: {np.round(c.rewards,1)}", flush=True)
t0 = time.time(); c.update_action(); print(f"second solve: {(time.time()-t0)*1e3:.0f} ms", flush=True)
assert np.isfinite(c.rewards).all()
print("SPOT SOLVE OK", flush=True)
