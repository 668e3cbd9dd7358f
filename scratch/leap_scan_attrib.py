import sys, time, os
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics import make_state
from judo_tpu.physics import smooth, collision, solver, linalg
from judo_tpu.physics.model import PhysicsState
import importlib
stepmod = importlib.import_module('judo_tpu.physics.step')

task = LeapCube()
pm = task.planning_model
R, T = 320, int(os.environ.get("T", "20"))
dtype = pm.qpos0.dtype
rng = np.random.default_rng(0)
ctrl = jnp.asarray(np.tile(QPOS_HOME[7:], (R, T, 1)) + 0.05*rng.standard_normal((R, T, 16)), dtype)
x0 = make_state(pm, qpos=QPOS_HOME)

def bench(name, f, *args, n=10):
    t0 = time.time(); out = f(*args); jax.block_until_ready(out)
    ct = time.time()-t0
    ts = []
    for _ in range(n):
        t0 = time.time(); out = f(*args); jax.block_until_ready(out); ts.append(time.time()-t0)
    print(f"{name:<36} compile {ct:6.1f}s  p50 {np.median(ts)*1e3:8.2f} ms", flush=True)

def scan_of(step_fn):
    def roll(c):
        def body(s, u):
            s2 = step_fn(s, u)
            return s2, s2.qpos[0]
        _, ys = jax.lax.scan(body, x0, c)
        return ys
    return jax.jit(lambda cs: jax.vmap(roll)(cs))

ONLY = set(os.environ.get("ONLY", "1,2,3,4").split(","))

# 1) full step
if "1" in ONLY:
    bench("scan full step", scan_of(lambda s, u: stepmod.step(pm, s, u)), ctrl)

# 2) smooth-only step (skip contacts entirely): monkeypatch has_contacts off
def smooth_step(s, u):
    h = pm.timestep
    kin = smooth.kinematics(pm, s)
    com = smooth.com_quantities(pm, kin)
    vel = smooth.velocity(pm, com, s.qvel)
    mm = smooth.crb_mass_matrix(pm, com)
    qfrc_bias = smooth.rne_bias(pm, com, vel, s.qvel)
    qfrc = smooth.actuation(pm, s, u) + smooth.passive_force(pm, s) - qfrc_bias
    f = linalg.cholesky(mm)
    qacc = linalg.cho_solve(f, qfrc)
    mh = mm + h * jnp.diag(pm.dof_damping)
    dv = linalg.spd_solve(mh, h * (mm @ qacc))
    qv = s.qvel + dv
    qp = stepmod._integrate_pos(pm, s.qpos, qv, h)
    return PhysicsState(qpos=qp, qvel=qv, time=s.time+h)
if "2" in ONLY:
    bench("scan smooth-only step", scan_of(smooth_step), ctrl)

# 3) smooth + collision (no solve)
def coll_step(s, u):
    kin = smooth.kinematics(pm, s)
    cons = collision.find_contacts(pm, kin)
    s2 = smooth_step(s, u)
    # keep collision live in the graph
    return PhysicsState(qpos=s2.qpos + 0.0*jnp.sum(cons.dist)*0.0, qvel=s2.qvel, time=s2.time)
if "3" in ONLY:
    bench("scan smooth+collision step", scan_of(coll_step), ctrl)

# 4) full step with solver iterations forced low
orig = solver.solve_dual_qp_matfree
def make_fullstep(iters):
    def f(J, minv_jt, reg, b, iterations, f_warm=None):
        return orig(J, minv_jt, reg, b, iters, f_warm)
    return f
if "4" in ONLY:
    for it in (1, 8):
        solver.solve_dual_qp_matfree = make_fullstep(it)
        bench(f"scan full step (APGD iters={it})", scan_of(lambda s, u: stepmod.step(pm, s, u)), ctrl)
    solver.solve_dual_qp_matfree = orig
