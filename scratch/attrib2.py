"""Post-lstsq-fix attribution: where do the remaining ms/step go?"""
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
R, T = 320, int(os.environ.get("T", "10"))
dtype = pm.qpos0.dtype
rng = np.random.default_rng(0)
ctrl = jnp.asarray(np.tile(QPOS_HOME[7:], (R, T, 1)) + 0.05*rng.standard_normal((R, T, 16)), dtype)
x0 = make_state(pm, qpos=QPOS_HOME)
NEFC = solver.num_constraint_rows(pm)
print("nefc:", NEFC, "slots:", collision.num_contact_slots(pm), flush=True)

def bench(name, f, *args, n=30):
    t0 = time.time(); out = f(*args); jax.block_until_ready(out)
    ct = time.time()-t0
    ts = []
    for _ in range(n):
        t0 = time.time(); out = f(*args); jax.block_until_ready(out); ts.append(time.time()-t0)
    per = np.median(ts)*1e3/T
    print(f"{name:<40} compile {ct:6.1f}s  p50 {np.median(ts)*1e3:8.2f} ms  ({per:6.3f} ms/step)", flush=True)

def scan_of(step_fn):
    def roll(c):
        def body(carry, u):
            s, f = carry
            s2, f2 = step_fn(s, u, f)
            return (s2, f2), s2.qpos[0]
        _, ys = jax.lax.scan(body, (x0, jnp.zeros(NEFC, dtype)), c)
        return ys
    return jax.jit(lambda cs: jax.vmap(roll)(cs))

def full(iters):
    orig = solver.solve_dual_qp_matfree
    def step_fn(s, u, f):
        def patched(J, minv_jt, reg, b, iterations, f_warm=None):
            return orig(J, minv_jt, reg, b, iters, f_warm)
        solver.solve_dual_qp_matfree = patched
        try:
            s2, res = stepmod.step_with_forward(pm, s, u, f)
        finally:
            solver.solve_dual_qp_matfree = orig
        return s2, res.efc_force
    return step_fn

ONLY = set(os.environ.get("ONLY", "a,b,c,d,e").split(","))

if "a" in ONLY:
    bench("full (iters=25)", scan_of(full(25)), ctrl)
if "b" in ONLY:
    bench("full (iters=8)", scan_of(full(8)), ctrl)
if "c" in ONLY:
    bench("full (iters=2)", scan_of(full(2)), ctrl)

# d) skip narrowphase: constant contacts (keeps assembly+solver live)
if "d" in ONLY:
    kin0 = smooth.kinematics(pm, x0)
    const_contacts = collision.find_contacts(pm, kin0)
    const_contacts = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x)) if hasattr(x, 'dtype') else x, const_contacts)
    realfc = collision.find_contacts
    def step_fn_noncol(s, u, f):
        collision.find_contacts = lambda m, kin: const_contacts
        try:
            s2, res = stepmod.step_with_forward(pm, s, u, f)
        finally:
            collision.find_contacts = realfc
        return s2, res.efc_force
    bench("full, const contacts (no narrowphase)", scan_of(step_fn_noncol), ctrl)

# e) narrowphase only (kinematics + find_contacts, integrate smooth-only)
if "e" in ONLY:
    def step_fn_colonly(s, u, f):
        kin = smooth.kinematics(pm, s)
        cons = collision.find_contacts(pm, kin)
        # smooth-ish integration to keep the scan honest
        qv = s.qvel * 0.99 + 1e-6*jnp.sum(cons.dist)
        qp = s.qpos.at[:3].add(pm.timestep * qv[:3])
        return PhysicsState(qpos=qp, qvel=qv, time=s.time+pm.timestep), f
    bench("kin + narrowphase only", scan_of(step_fn_colonly), ctrl)
