"""Deletion surgery on the real tuple-domain kinematics kernel (B=384)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics.lane_engine import (
    tq_mul, tq_rotate, tq_normalize, tv_add, tv_sub, tv_scale, tq_to_mat9,
    t_stackn, t_stack33,
)
from judo_tpu.physics.model import FREE, BALL, SLIDE, HINGE

task = LeapCube()
pm = task.planning_model
B, T, LT = 384, 100, 128
dt = jnp.float32

npd = lambda a: np.asarray(jax.device_get(a), np.float64)
body_pos = npd(pm.body_pos); body_quat = npd(pm.body_quat)
jnt_pos = npd(pm.jnt_pos); jnt_axis = npd(pm.jnt_axis); qpos0 = npd(pm.qpos0)
geom_pos = npd(pm.geom_pos); geom_quat = npd(pm.geom_quat)

f3 = lambda v: (float(v[0]), float(v[1]), float(v[2]))
f4 = lambda v: (float(v[0]), float(v[1]), float(v[2]), float(v[3]))

def bodies_loop(qp, linear_hinge=False):
    xpos_t = [(0.0, 0.0, 0.0)]
    xquat_t = [(1.0, 0.0, 0.0, 0.0)]
    for b in range(1, pm.nbody):
        p = pm.body_parentid[b]
        pos = tv_add(xpos_t[p], tq_rotate(xquat_t[p], f3(body_pos[b])))
        quat = tq_mul(xquat_t[p], f4(body_quat[b]))
        for k in range(pm.body_jntnum[b]):
            j = pm.body_jntadr[b] + k
            jt = pm.jnt_type[j]
            qadr = pm.jnt_qposadr[j]
            anchor = tv_add(tq_rotate(quat, f3(jnt_pos[j])), pos)
            if jt == FREE:
                pos = (qp[qadr], qp[qadr + 1], qp[qadr + 2])
                quat = tq_normalize((qp[qadr + 3], qp[qadr + 4], qp[qadr + 5], qp[qadr + 6]))
            elif jt == HINGE:
                half = 0.5 * (qp[qadr] - float(qpos0[qadr]))
                ax = f3(jnt_axis[j])
                if linear_hinge:
                    qloc = (1.0 - half * half, ax[0] * half, ax[1] * half, ax[2] * half)
                else:
                    s = jnp.sin(half)
                    qloc = (jnp.cos(half), ax[0] * s, ax[1] * s, ax[2] * s)
                quat = tq_mul(quat, qloc)
                pos = tv_sub(anchor, tq_rotate(quat, f3(jnt_pos[j])))
        xpos_t.append(pos)
        xquat_t.append(quat)
    return xpos_t, xquat_t

def acc_tuples(ts_list):
    acc = 0.0
    for t in ts_list:
        for c in t:
            acc = acc + c
    return acc

def V_bodies_scalar(qp):
    xp, xq = bodies_loop(qp)
    return acc_tuples(xp) + acc_tuples(xq)

def V_bodies_linear(qp):
    xp, xq = bodies_loop(qp, linear_hinge=True)
    return acc_tuples(xp) + acc_tuples(xq)

def V_plus_geoms_scalar(qp):
    xp, xq = bodies_loop(qp)
    acc = acc_tuples(xp) + acc_tuples(xq)
    for g in range(pm.ngeom):
        b = pm.geom_bodyid[g]
        gx = tv_add(xp[b], tq_rotate(xq[b], f3(geom_pos[g])))
        m9 = tq_to_mat9(tq_mul(xq[b], f4(geom_quat[g])))
        acc = acc + acc_tuples([gx]) + acc_tuples([m9])
    return acc

def V_plus_stacks(qp):
    xp, xq = bodies_loop(qp)
    outs = [t_stackn(t, LT, dt) for t in xp] + [t_stackn(t, LT, dt) for t in xq]
    mats = [t_stack33(tq_to_mat9(t), LT, dt) for t in xq]
    return sum(jnp.sum(o, axis=0) for o in outs) + sum(jnp.sum(mm.reshape(9, -1), axis=0) for mm in mats)

for name, fn in [
    ("bodies scalar-out", V_bodies_scalar),
    ("bodies linear-hinge", V_bodies_linear),
    ("bodies+geoms scalar", V_plus_geoms_scalar),
    ("bodies+stacked-out", V_plus_stacks),
]:
    def kernel(qp_ref, oq_ref, fn=fn):
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
    run = jax.jit(lambda qp: jax.lax.scan(lambda c, _: (pcall(c), None), qp, None, length=T)[0])
    qp0 = jnp.asarray(np.tile(np.asarray(QPOS_HOME, np.float32), (B, 1)).T)
    try:
        t0 = time.time(); jax.block_until_ready(run(qp0)); comp = time.time() - t0
        ts = []
        for _ in range(15):
            t0 = time.perf_counter(); jax.block_until_ready(run(qp0)); ts.append(time.perf_counter() - t0)
        print(f"{name:<22} {np.median(ts)*1e6/T:8.1f} us/step  compile {comp:5.1f}s", flush=True)
    except Exception as e:
        print(f"{name:<22} FAIL {str(e).splitlines()[0][:90]}", flush=True)
