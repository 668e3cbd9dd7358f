import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics import lane_engine as le

task = LeapCube()
pm = task.planning_model
B, T, LT = 384, 100, 128
dt = jnp.float32

# ---- part 1: op-class probes (NREP ops of one class per kernel) ----
NREP = 400

def probe(name, body_fn):
    def kernel(a_ref, o_ref):
        o_ref[:] = body_fn(a_ref[:])
    def pcall(x):
        return pl.pallas_call(
            kernel, grid=(1,),
            in_specs=[pl.BlockSpec((8, LT), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((8, LT), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, LT), dt),
        )(x)
    def loop(x):
        return jax.lax.scan(lambda c, _: (pcall(c), None), x, None, length=T)[0]
    run = jax.jit(loop)
    x = jnp.full((8, LT), 0.73, dt)
    try:
        jax.block_until_ready(run(x))
        ts = []
        for _ in range(20):
            t0 = time.perf_counter(); jax.block_until_ready(run(x)); ts.append(time.perf_counter() - t0)
        per_op_ns = np.median(ts) / T / NREP * 1e9
        print(f"op[{name:<12}] {per_op_ns:8.2f} ns/op", flush=True)
    except Exception as e:
        print(f"op[{name:<12}] FAIL {str(e).splitlines()[0][:80]}", flush=True)

def mk_chain(op):
    def body(x):
        v = x
        for _ in range(NREP):
            v = op(v)
        return v
    return body

probe("fma", mk_chain(lambda v: v * 0.999 + 1e-6))
probe("sqrt", mk_chain(lambda v: jnp.sqrt(v + 1.0)))
probe("sincos", mk_chain(lambda v: jnp.sin(v) * 0.1 + jnp.cos(v) * 0.1))
probe("div", mk_chain(lambda v: 1.7 / (v + 2.0)))
probe("where", mk_chain(lambda v: jnp.where(v > 0.5, v * 0.999, v + 1e-3)))
probe("row1", mk_chain(lambda v: v.at[0:1].set(v[0:1] * 0.999 + 1e-6) if False else jnp.concatenate([v[0:1] * 0.999 + 1e-6, v[1:]], axis=0)))

def stack_body(x):
    v = x[0]
    for _ in range(NREP // 4):
        s = jnp.stack([v, v * 0.5, v * 0.25])  # (3, LT)
        v = s[0] + s[1] + s[2] + 1e-6
    return jnp.broadcast_to(v[None], (8, LT))
probe("stack3", stack_body)

# ---- part 2: kinematics sub-stage bisect ----
def sub_kin(qp, upto):
    """Replicate kinematics_l stages: upto in {bodies, xmat, ipos, geoms, full}."""
    kin = le.kinematics_l(pm, qp)
    if upto == "bodies":
        acc = sum(jnp.sum(x, axis=0) for x in kin.xpos) + sum(jnp.sum(q, axis=0) for q in kin.xquat)
    elif upto == "geoms":
        acc = sum(jnp.sum(x, axis=0) for x in kin.geom_xpos)
    else:
        acc = sum(jnp.sum(x, axis=0) for x in kin.site_xpos) + sum(
            jnp.sum(x.reshape(9, -1), axis=0) for x in kin.ximat)
    return acc

# bodies-only variant: monkeypatch-free — just time full kin (already known)
# and a "no-mats" variant by calling internals
import judo_tpu.physics.lane_engine as le2

def kin_bodies_only(qp):
    dtype = qp.dtype
    B_ = qp.shape[-1]
    npd = lambda a: np.asarray(jax.device_get(a), np.float64)
    body_pos = npd(pm.body_pos); body_quat = npd(pm.body_quat)
    jnt_pos = npd(pm.jnt_pos); jnt_axis = npd(pm.jnt_axis); qpos0 = npd(pm.qpos0)
    ones = jnp.ones(B_, dtype); zeros = jnp.zeros(B_, dtype)
    const3 = lambda v: jnp.stack([jnp.full(B_, float(v[i]), dtype) for i in range(3)])
    const4 = lambda v: jnp.stack([jnp.full(B_, float(v[i]), dtype) for i in range(4)])
    from judo_tpu.physics.model import FREE, BALL, SLIDE, HINGE
    from judo_tpu.physics.lane_engine import l_quat_mul, l_quat_rotate, usum, v3
    xpos = [v3(zeros, zeros, zeros)]
    xquat = [jnp.stack([ones, zeros, zeros, zeros])]
    for b in range(1, pm.nbody):
        p = pm.body_parentid[b]
        pos = xpos[p] + l_quat_rotate(xquat[p], const3(body_pos[b]))
        quat = l_quat_mul(xquat[p], const4(body_quat[b]))
        for k in range(pm.body_jntnum[b]):
            j = pm.body_jntadr[b] + k
            jt = pm.jnt_type[j]; qadr = pm.jnt_qposadr[j]
            anchor = l_quat_rotate(quat, const3(jnt_pos[j])) + pos
            if jt == FREE:
                pos = qp[qadr:qadr+3]; quat = qp[qadr+3:qadr+7]
                quat = quat / jnp.sqrt(jnp.maximum(usum(quat*quat, 0), 1e-15))[None]
            elif jt == HINGE:
                angle = qp[qadr] - float(qpos0[qadr]); half = 0.5*angle
                ax = const3(jnt_axis[j])
                qloc = jnp.concatenate([jnp.cos(half)[None], ax*jnp.sin(half)[None]], axis=0)
                quat = l_quat_mul(quat, qloc)
                pos = anchor - l_quat_rotate(quat, const3(jnt_pos[j]))
        xpos.append(pos); xquat.append(quat)
    return sum(jnp.sum(x, axis=0) for x in xpos) + sum(jnp.sum(q, axis=0) for q in xquat)

def stage(name, fn):
    def kernel(qp_ref, oq_ref):
        acc = fn(qp_ref[:])
        oq_ref[:] = qp_ref[:] + 1e-12 * acc[None]
    def pcall(qp):
        return pl.pallas_call(
            kernel, grid=(B // LT,),
            in_specs=[pl.BlockSpec((pm.nq, LT), lambda i: (0, i))],
            out_specs=pl.BlockSpec((pm.nq, LT), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((pm.nq, B), dt),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        )(qp)
    def loop(qp):
        return jax.lax.scan(lambda c, _: (pcall(c), None), qp, None, length=T)[0]
    run = jax.jit(loop, compiler_options={"xla_tpu_scoped_vmem_limit_kib": 98304})
    qp0 = jnp.asarray(np.tile(np.asarray(QPOS_HOME, np.float32), (B, 1)).T)
    try:
        t0 = time.time(); jax.block_until_ready(run(qp0)); comp = time.time() - t0
        ts = []
        for _ in range(15):
            t0 = time.perf_counter(); jax.block_until_ready(run(qp0)); ts.append(time.perf_counter() - t0)
        print(f"kin[{name:<12}] {np.median(ts)*1e6/T:8.1f} us/step  compile {comp:5.1f}s", flush=True)
    except Exception as e:
        print(f"kin[{name:<12}] FAIL {str(e).splitlines()[0][:90]}", flush=True)

stage("bodies-only", kin_bodies_only)
stage("full-kin", lambda qp: sub_kin(qp, "full"))
