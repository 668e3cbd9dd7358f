import sys; sys.path.insert(0, "/root/repo")
import time, traceback
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from judo_tpu.tasks.leap_cube import LeapCube
from judo_tpu.physics import lane_engine as le, lane_step as ls, lane_collision as lc
from judo_tpu.physics.solver import num_constraint_rows

task = LeapCube()
pm = task.planning_model
nefc = num_constraint_rows(pm)
B = 128
dt = jnp.float32

def try_stage(name, fn, nouts):
    def kernel(qp_ref, qv_ref, ct_ref, f_ref, *orefs):
        outs = fn(qp_ref[:], qv_ref[:], ct_ref[:], f_ref[:])
        for r, o in zip(orefs, outs):
            r[:] = o
    def call(qp, qv, ct, f):
        return pl.pallas_call(kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(x.shape, lambda i: (0,0)) for x in (qp,qv,ct,f)],
            out_specs=tuple(pl.BlockSpec((1,B), lambda i: (0,0)) for _ in range(nouts)),
            out_shape=tuple(jax.ShapeDtypeStruct((1,B), dt) for _ in range(nouts)),
        )(qp,qv,ct,f)
    qp = jnp.zeros((pm.nq,B),dt); qv = jnp.zeros((pm.nv,B),dt)
    ct = jnp.zeros((pm.nu,B),dt); f = jnp.zeros((nefc,B),dt)
    try:
        jax.jit(call).lower(qp,qv,ct,f)
        print(f"{name:<22} LOWER OK", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name:<22} FAIL: {type(e).__name__}: {msg}", flush=True)

def reduce1(*arrs):
    tot = 0.
    for a in arrs:
        if isinstance(a, (list, tuple)):
            tot = tot + sum(jnp.sum(x) for x in a)
        else:
            tot = tot + jnp.sum(a)
    return [jnp.broadcast_to(tot[None,None], (1,B))]

def s_kin(qp,qv,ct,f):
    k = le.kinematics_l(pm, qp)
    return reduce1(k.xpos, k.xquat, [x for x in k.geom_xpos], [x for x in k.geom_xmat])
try_stage("kinematics", s_kin, 1)

def s_com(qp,qv,ct,f):
    k = le.kinematics_l(pm, qp)
    c = le.com_l(pm, k)
    return reduce1(c.subtree_com, c.cinert, c.cdof)
try_stage("com", s_com, 1)

def s_crb(qp,qv,ct,f):
    k = le.kinematics_l(pm, qp)
    c = le.com_l(pm, k)
    mm = le.crb_mass_matrix_l(pm, c)
    return reduce1(mm)
try_stage("crb", s_crb, 1)

def s_rne(qp,qv,ct,f):
    k = le.kinematics_l(pm, qp)
    c = le.com_l(pm, k)
    v = le.velocity_l(pm, c, qv)
    return reduce1(le.rne_bias_l(pm, c, v, qv), le.passive_force_l(pm, qp, qv), le.actuation_l(pm, qp, qv, ct))
try_stage("rne+passive+act", s_rne, 1)

def s_inv(qp,qv,ct,f):
    k = le.kinematics_l(pm, qp)
    c = le.com_l(pm, k)
    mm = le.crb_mass_matrix_l(pm, c)
    return reduce1(le.spd_inverse_l(mm))
try_stage("spd_inverse", s_inv, 1)

def s_col(qp,qv,ct,f):
    k = le.kinematics_l(pm, qp)
    cons = lc.find_contacts_l(pm, k)
    return reduce1([c.dist for c in cons], [c.pos for c in cons], [c.normal for c in cons])
try_stage("collision", s_col, 1)

def s_asm(qp,qv,ct,f):
    k = le.kinematics_l(pm, qp)
    c = le.com_l(pm, k)
    cons = lc.find_contacts_l(pm, k)
    rows = ls.assemble_constraints_l(pm, c, cons, qp, qv)
    return reduce1(rows.J, rows.aref, rows.reg, rows.active)
try_stage("assembly", s_asm, 1)

def s_solve(qp,qv,ct,f):
    k = le.kinematics_l(pm, qp)
    c = le.com_l(pm, k)
    mm = le.crb_mass_matrix_l(pm, c)
    minv = le.spd_inverse_l(mm)
    cons = lc.find_contacts_l(pm, k)
    rows = ls.assemble_constraints_l(pm, c, cons, qp, qv)
    J = rows.J * rows.active[:, None, :]
    b = jnp.sum(J * qv[None]*0., axis=1) - rows.aref
    ff = ls.solve_dual_qp_l(J, minv, jnp.where(rows.active>0, rows.reg, 1.0), b, 25, f)
    return reduce1(ff)
try_stage("apgd", s_solve, 1)

def s_sens(qp,qv,ct,f):
    k = le.kinematics_l(pm, qp)
    return reduce1(ls.evaluate_sensors_l(pm, k, qp, qv))
try_stage("sensors", s_sens, 1)

def s_int(qp,qv,ct,f):
    return reduce1(ls.integrate_pos_l(pm, qp, qv, 0.01))
try_stage("integrate", s_int, 1)
