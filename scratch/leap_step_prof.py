import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, dataclasses
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics import make_state
from judo_tpu.physics.step import step_with_forward
from judo_tpu.physics import smooth, collision, solver

task = LeapCube()
R = 320
qb = jnp.tile(jnp.asarray(QPOS_HOME, jnp.float32), (R, 1))
ctrl = jnp.tile(jnp.asarray(QPOS_HOME[7:], jnp.float32), (R, 1))

def timeit(name, fn, *args, n=12):
    t0 = time.time(); out = fn(*args); jax.block_until_ready(out)
    c = time.time()-t0
    ts = []
    for _ in range(n):
        t0 = time.time(); out = fn(*args); jax.block_until_ready(out); ts.append(time.time()-t0)
    print(f"{name}: compile {c:.1f}s steady p50 {np.median(ts)*1e3:.2f} ms", flush=True)

for iters in (0, 5, 25):
    pm = dataclasses.replace(task.planning_model, solver_iterations=iters) if iters else dataclasses.replace(task.planning_model, contact_enabled=False, limit_enabled=False)
    x0 = make_state(pm)
    f = jax.jit(jax.vmap(lambda q, c: step_with_forward(pm, make_state(pm, qpos=q), c)[0].qpos, in_axes=(0, 0)))
    timeit(f"step R=320 iters={iters if iters else 'OFF'}", f, qb, ctrl)

# collision only
pm = task.planning_model
f2 = jax.jit(jax.vmap(lambda q: collision.find_contacts(pm, smooth.kinematics(pm, make_state(pm, qpos=q))).dist.sum()))
timeit("collision+kin only R=320", f2, qb)

# smooth pipeline only
def sm(q):
    s = make_state(pm, qpos=q)
    kin = smooth.kinematics(pm, s)
    com = smooth.com_quantities(pm, kin)
    vel = smooth.velocity(pm, com, s.qvel)
    mm = smooth.crb_mass_matrix(pm, com)
    bias = smooth.rne_bias(pm, com, vel, s.qvel)
    return mm.sum() + bias.sum()
timeit("smooth pipeline R=320", jax.jit(jax.vmap(sm)), qb)
