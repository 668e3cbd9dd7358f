import sys, time; sys.path.insert(0, "/root/repo")
import importlib
import jax, jax.numpy as jnp, numpy as np
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics import make_state
from judo_tpu.physics import smooth, collision, solver, linalg
stepmod = importlib.import_module('judo_tpu.physics.step')
from judo_tpu.physics.model import PhysicsState

task = LeapCube()
pm = task.planning_model
R, ITER = 320, 100
dtype = pm.qpos0.dtype
rng = np.random.default_rng(0)
qpos_b = jnp.tile(jnp.asarray(QPOS_HOME, dtype)[None], (R, 1)) + 0.01*jnp.asarray(rng.standard_normal((R, pm.nq)), dtype)
qvel_b = 0.1*jnp.asarray(rng.standard_normal((R, pm.nv)), dtype)
sb = PhysicsState(qpos=qpos_b, qvel=qvel_b, time=jnp.zeros(R, dtype))
c0 = jnp.tile(jnp.asarray(QPOS_HOME[7:], dtype)[None], (R, 1))

def scan_bench(name, fn, init, n=5):
    """fn: carry -> carry, iterated ITER times on device."""
    def loop(x):
        return jax.lax.scan(lambda c, _: (fn(c), 0.0), x, None, length=ITER)[0]
    f = jax.jit(loop)
    t0 = time.time(); out = f(init); jax.block_until_ready(out)
    ct = time.time()-t0
    ts = []
    for _ in range(n):
        t0 = time.time(); out = f(init); jax.block_until_ready(out); ts.append(time.time()-t0)
    per = np.median(ts)/ITER*1e3
    print(f"{name:<30} compile {ct:6.1f}s  p50/iter {per:7.3f} ms", flush=True)

# full step (the rollout body)
scan_bench("step", lambda s: jax.vmap(lambda ss: stepmod.step(pm, ss, c0[0]))(s), sb)

# smooth-only pipeline iterated (carry qpos via integrate-free trick: perturb)
def smooth_carry(s):
    kin = jax.vmap(lambda q: smooth.kinematics(pm, PhysicsState(q, s.qvel[0], s.time[0])))(s.qpos)
    com = jax.vmap(lambda k: smooth.com_quantities(pm, k))(kin)
    mm = jax.vmap(lambda c: smooth.crb_mass_matrix(pm, c))(com)
    vel = jax.vmap(lambda c, v: smooth.velocity(pm, c, v))(com, s.qvel)
    bias = jax.vmap(lambda c, v, qv: smooth.rne_bias(pm, c, v, qv))(com, vel, s.qvel)
    dq = bias * 1e-9
    return PhysicsState(s.qpos + jnp.pad(dq, ((0,0),(0,pm.nq-pm.nv)))*0 + mm[..., 0, :1]*1e-12, s.qvel, s.time)
scan_bench("smooth pipeline", smooth_carry, sb)

# kinematics only
def kin_carry(s):
    kin = jax.vmap(lambda q: smooth.kinematics(pm, PhysicsState(q, s.qvel[0], s.time[0])))(s.qpos)
    return PhysicsState(s.qpos + kin.xpos[:, -1, :1]*1e-12, s.qvel, s.time)
scan_bench("kinematics", kin_carry, sb)

# kin + collision
def col_carry(s):
    kin = jax.vmap(lambda q: smooth.kinematics(pm, PhysicsState(q, s.qvel[0], s.time[0])))(s.qpos)
    con = jax.vmap(lambda k: collision.find_contacts(pm, k))(kin)
    return PhysicsState(s.qpos + con.dist[:, :1]*1e-12, s.qvel, s.time)
scan_bench("kin+collision", col_carry, sb)

# forward (everything except integration)
def fwd_carry(s):
    qacc = jax.vmap(lambda ss, cc: stepmod.forward(pm, ss, cc).qacc)(s, c0)
    return PhysicsState(s.qpos + jnp.pad(qacc*1e-12, ((0,0),(0,pm.nq-pm.nv))), s.qvel, s.time)
scan_bench("forward", fwd_carry, sb)
