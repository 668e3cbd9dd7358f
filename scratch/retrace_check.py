import sys, time; sys.path.insert(0, "/root/repo")
import os; os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from judo_tpu.controller import Controller, ControllerConfig
from judo_tpu.optimizers import PredictiveSampling, PredictiveSamplingConfig
from judo_tpu.tasks import SpotNavigate

np.random.seed(0)
task = SpotNavigate()
opt = PredictiveSampling(PredictiveSamplingConfig(num_rollouts=4, num_nodes=3, sigma=0.1), task.nu)
c = Controller(ControllerConfig(horizon=0.4, spline_order="linear"), task, opt)
for i in range(4):
    t0 = time.time(); c.update_action(); dt = time.time()-t0
    print(f"solve {i}: {dt:.1f}s  cache_size={c._solve_fn._cache_size()}", flush=True)
