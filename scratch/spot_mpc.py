import sys, time; sys.path.insert(0, "/root/repo")
import os; os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from judo_tpu.controller import Controller, ControllerConfig
from judo_tpu.optimizers import PredictiveSampling, PredictiveSamplingConfig
from judo_tpu.tasks import SpotNavigate
from judo_tpu.app.structs import MujocoState
from judo_tpu.simulation import get_simulation_backend

np.random.seed(0)
task = SpotNavigate()
task.config.goal_position = np.array([2.0, 0.0, 0.52])
opt = PredictiveSampling(PredictiveSamplingConfig(num_rollouts=8, num_nodes=3, use_noise_ramp=True, noise_ramp=3.5, sigma=0.1), task.nu)
cc = ControllerConfig(horizon=0.6, spline_order="linear")
c = Controller(cc, task, opt)
print("nu:", task.nu, "T:", c.num_timesteps, flush=True)

t0 = time.time()
c.update_action()
print(f"first spot solve (compile): {time.time()-t0:.1f}s; rewards finite: {np.isfinite(c.rewards).all()}", flush=True)

# closed loop with the policy sim backend (JT engine or mujoco+policy? host sim needs policy too!)
# For the real sim we must also run the policy: use the task's policy via a tiny host loop.
from judo_tpu.tasks.spot.policy import policy_rollout
import jax.numpy as jnp
from judo_tpu.physics import make_state

pm = task.planning_model
sim_state = make_state(pm, qpos=task.data.qpos, qvel=task.data.qvel)
pout = jnp.zeros(12, jnp.float32)
step_fn = jax.jit(lambda s, cmd, p: policy_rollout(pm, task.policy, s, cmd[None], p))
for i in range(40):
    msg = MujocoState(float(sim_state.time), np.asarray(sim_state.qpos), np.asarray(sim_state.qvel), None, None, np.zeros((0,3)), np.zeros((0,4)), {})
    c.update_states(msg)
    t0 = time.time(); c.update_action(); plan = time.time()-t0
    cmd = task.task_to_sim_ctrl(jnp.asarray(c.action(float(sim_state.time)), jnp.float32))
    out = step_fn(sim_state, cmd, pout)
    sim_state = make_state(pm, qpos=out.states[0][:pm.nq], qvel=out.states[0][pm.nq:], time=float(sim_state.time)+0.02)
    pout = out.final_policy_output
    if i % 10 == 0:
        q = np.asarray(sim_state.qpos)
        print(f"i={i} x={q[0]:.3f} z={q[2]:.3f} plan={plan*1e3:.0f}ms best_r={c.rewards.max():.1f}", flush=True)
q = np.asarray(sim_state.qpos)
print("final x:", round(float(q[0]),3), "z:", round(float(q[2]),3), flush=True)
print("NAVIGATING" if q[0] > 0.1 and q[2] > 0.35 else "PROBLEM", flush=True)
