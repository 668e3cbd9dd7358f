import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics import make_state, rollout
from judo_tpu.physics import smooth, collision, solver, linalg
import importlib
stepmod = importlib.import_module('judo_tpu.physics.step')
from judo_tpu.physics.collision import num_contact_slots

print("devices:", jax.devices(), flush=True)
task = LeapCube()
pm = task.planning_model
print("nv:", pm.nv, "nq:", pm.nq, "slots:", num_contact_slots(pm), "solver_iters:", pm.solver_iterations, flush=True)
R, T = 320, 100
dtype = pm.qpos0.dtype
print("dtype:", dtype, flush=True)
rng = np.random.default_rng(0)
ctrl = jnp.asarray(np.tile(QPOS_HOME[7:], (R, T, 1)) + 0.05*rng.standard_normal((R, T, 16)), dtype)
x0 = make_state(pm, qpos=QPOS_HOME)

def bench(name, f, *args, n=20):
    t0 = time.time(); out = f(*args); jax.block_until_ready(out)
    compile_t = time.time()-t0
    ts = []
    for _ in range(n):
        t0 = time.time(); out = f(*args); jax.block_until_ready(out); ts.append(time.time()-t0)
    print(f"{name:<28} compile {compile_t:6.1f}s  p50 {np.median(ts)*1e3:8.2f} ms", flush=True)
    return out

# full rollout
full = jax.jit(lambda c: jax.vmap(lambda cc: rollout(pm, x0, cc))(c).states)
import os
if os.environ.get("FULL"): bench("full rollout", full, ctrl)

# batched states for component benches: use x0 replicated
qpos_b = jnp.tile(jnp.asarray(QPOS_HOME, dtype)[None], (R, 1)) + 0.01*jnp.asarray(rng.standard_normal((R, pm.nq)), dtype)
qvel_b = 0.1*jnp.asarray(rng.standard_normal((R, pm.nv)), dtype)
from judo_tpu.physics.model import PhysicsState
sb = PhysicsState(qpos=qpos_b, qvel=qvel_b, time=jnp.zeros(R, dtype))
c0 = ctrl[:, 0]

# one batched step (no scan): isolates per-step cost x100
one_step = jax.jit(lambda s, c: jax.vmap(lambda ss, cc: stepmod.step(pm, ss, cc))(s, c))
bench("1 batched step (x100=rollout)", one_step, sb, c0)

# smooth pipeline only
def smooth_only(s):
    kin = smooth.kinematics(pm, s)
    com = smooth.com_quantities(pm, kin)
    vel = smooth.velocity(pm, com, s.qvel)
    mm = smooth.crb_mass_matrix(pm, com)
    qfrc = smooth.rne_bias(pm, com, vel, s.qvel)
    return mm, qfrc
sm = jax.jit(lambda s: jax.vmap(lambda ss: smooth_only(ss))(s))
bench("smooth (kin+com+crb+rne)", sm, sb)

# collision only
col = jax.jit(lambda s: jax.vmap(lambda ss: collision.find_contacts(pm, smooth.kinematics(pm, ss)))(s))
bench("kinematics+collision", col, sb)

# cholesky + solve only
def chol_path(s):
    kin = smooth.kinematics(pm, s)
    com = smooth.com_quantities(pm, kin)
    mm = smooth.crb_mass_matrix(pm, com)
    f = linalg.cholesky(mm)
    return linalg.cho_solve(f, s.qvel)
ch = jax.jit(lambda s: jax.vmap(lambda ss: chol_path(ss))(s))
bench("kin+com+crb+cholesky", ch, sb)

# full forward (adds constraint assembly + APGD)
fw = jax.jit(lambda s, c: jax.vmap(lambda ss, cc: stepmod.forward(pm, ss, cc).qacc)(s, c))
bench("full forward", fw, sb, c0)
