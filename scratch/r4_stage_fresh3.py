"""Stage timings with FRESH args + pipelined dispatch (the honest method on
the axon tunnel — same-arg repeats pay a ~25 ms pathology, blocking single
dispatches pay ~22 ms RTT; see scratch/r4_fused_fresh.py)."""
import sys; sys.path.insert(0, "/root/repo")
import os
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
from judo_tpu.physics import lane_engine as le, lane_step as ls
from judo_tpu.physics.lane_collision import find_contacts_l
from judo_tpu.physics.solver import num_constraint_rows

task = LeapCube()
pm = task.planning_model
nefc = num_constraint_rows(pm)
B, T = 384, 100
LT = 128
dt = jnp.float32


def mk_full(iters, lips):
    def stage(qp, qv, ct, f):
        out = ls.step_l(pm, qp, qv, ct, f, solver_iterations=iters, lipschitz=lips)
        return out.qpos, out.qvel, out.efc_force
    return stage


def stage_kin(qp, qv, ct, f):
    k = le.kinematics_l(pm, qp)
    acc = sum(jnp.sum(x, axis=0) for x in k.xpos) + sum(jnp.sum(x, axis=0) for x in k.geom_xpos)
    return qp + 1e-12 * acc[None], qv, f


def stage_collision(qp, qv, ct, f):
    k = le.kinematics_l(pm, qp)
    cons = find_contacts_l(pm, k)
    acc = sum(c.dist for c in cons)
    return qp + 1e-12 * acc[None], qv, f


def stage_nosolver(qp, qv, ct, f):
    k = le.kinematics_l(pm, qp)
    c = le.com_l(pm, k)
    v = le.velocity_l(pm, c, qv)
    mm = le.crb_mass_matrix_l(pm, c)
    bias = le.rne_bias_l(pm, c, v, qv)
    sm = le.actuation_l(pm, qp, qv, ct) + le.passive_force_l(pm, qp, qv) - bias
    minv = le.spd_inverse_l(mm)
    qacc = le.mat_vec_l(minv, sm)
    cons = find_contacts_l(pm, k)
    rows = ls.assemble_constraints_l(pm, c, cons, qp, qv)
    J = rows.J * rows.active[:, None, :]
    b = ls.j_vec_chunked(J, qacc) - rows.aref * rows.active
    sens = ls.evaluate_sensors_l(pm, k, qp, qv)
    damp = ls.implicit_damping_np(pm)
    mh = mm + 0.01 * le.eye_mask(pm.nv, dt) * le.const_col(damp, dt)[:, :, None]
    mhinv = le.spd_inverse_l(mh)
    dv = le.mat_vec_l(mhinv, 0.01 * le.mat_vec_l(mm, qacc))
    qvn = qv + dv
    qpn = ls.integrate_pos_l(pm, qp, qvn, 0.01)
    return qpn + 1e-12 * (jnp.sum(b, axis=0) + jnp.sum(sens, axis=0))[None], qvn, b[: max(nefc, 1)]




def stage_asm_nostack(qp, qv, ct, f):
    # assembly arithmetic WITHOUT materializing the (nefc, nv, B) J stack
    import judo_tpu.physics.lane_step as lsm
    k = le.kinematics_l(pm, qp)
    c = le.com_l(pm, k)
    cons = find_contacts_l(pm, k)
    # replicate the contact-row arithmetic, but reduce instead of stacking
    from judo_tpu.physics.lane_collision import tangent_frame_l
    from judo_tpu.physics.lane_engine import const_col
    import numpy as _np
    body_dof_mask = _np.asarray(jax.device_get(pm.body_dof_mask))
    CD = jnp.stack(c.cdof)
    ANG = CD[:, :3, :]
    LIN = CD[:, 3:, :]
    acc = jnp.zeros((pm.nv, qp.shape[-1]), dt)
    accs = jnp.zeros(qp.shape[-1], dt)
    for ct_ in cons:
        arm1 = ct_.pos - c.root_com[ct_.body1]
        arm2 = ct_.pos - c.root_com[ct_.body2]
        lin1 = LIN + le.l_cross(ANG, arm1[None])
        lin2 = LIN + le.l_cross(ANG, arm2[None])
        mask1 = const_col(body_dof_mask[ct_.body1], dt)[:, :, None]
        mask2 = const_col(body_dof_mask[ct_.body2], dt)[:, :, None]
        jac = mask2 * lin2 - mask1 * lin1
        t1, t2 = tangent_frame_l(ct_.normal)
        n_row = le.usum(jac * ct_.normal[None], 1)
        t1_row = le.usum(jac * t1[None], 1)
        t2_row = le.usum(jac * t2[None], 1)
        imp = lsm.impedance_l(ct_.solimp, ct_.dist - ct_.includemargin)
        acc = acc + n_row + t1_row + t2_row
        accs = accs + le.usum(n_row * qv, 0) + imp
    return qp + 1e-12 * (jnp.sum(acc, axis=0) + accs)[None], qv, f

STAGES = [
    ("kin+collision", stage_collision),
    ("kin+com+coll+asm", None),
    ("asm-nostack", stage_asm_nostack),
    ("all-but-solver", stage_nosolver),
]
def stage_asm(qp, qv, ct, f):
    k = le.kinematics_l(pm, qp)
    c = le.com_l(pm, k)
    cons = find_contacts_l(pm, k)
    rows = ls.assemble_constraints_l(pm, c, cons, qp, qv)
    J = rows.J * rows.active[:, None, :]
    acc = jnp.sum(rows.aref, axis=0) + jnp.sum(J[0], axis=0) + jnp.sum(rows.diag, axis=0)
    return qp + 1e-12 * acc[None], qv, f
STAGES[1] = ("kin+com+coll+asm", stage_asm)

qp0_np = np.tile(np.asarray(QPOS_HOME, np.float32), (B, 1)).T

for name, fn in STAGES:
    def kernel(qp_ref, qv_ref, ct_ref, f_ref, oq, ov, of_, fn=fn):
        a, b_, c_ = fn(qp_ref[:], qv_ref[:], ct_ref[:], f_ref[:])
        oq[:] = a
        ov[:] = b_
        of_[:] = jnp.broadcast_to(c_, of_.shape) if c_.shape != of_.shape else c_

    def pcall(qp, qv, ct, f):
        return pl.pallas_call(
            kernel,
            grid=(B // LT,),
            in_specs=[pl.BlockSpec((pm.nq, LT), lambda i: (0, i)),
                      pl.BlockSpec((pm.nv, LT), lambda i: (0, i)),
                      pl.BlockSpec((pm.nu, LT), lambda i: (0, i)),
                      pl.BlockSpec((max(nefc, 1), LT), lambda i: (0, i))],
            out_specs=(pl.BlockSpec((pm.nq, LT), lambda i: (0, i)),
                       pl.BlockSpec((pm.nv, LT), lambda i: (0, i)),
                       pl.BlockSpec((max(nefc, 1), LT), lambda i: (0, i))),
            out_shape=(jax.ShapeDtypeStruct((pm.nq, B), dt),
                       jax.ShapeDtypeStruct((pm.nv, B), dt),
                       jax.ShapeDtypeStruct((max(nefc, 1), B), dt)),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(qp, qv, ct, f)

    @jax.jit
    def loop(key):
        qp0 = jnp.asarray(qp0_np) + 0.01 * jax.random.normal(key, (pm.nq, B), dt)
        qv0 = jnp.zeros((pm.nv, B), dt)
        ct0 = jnp.asarray(np.tile(np.asarray(QPOS_HOME[7:], np.float32), (B, 1)).T)
        f0 = jnp.zeros((max(nefc, 1), B), dt)
        def body(carry, _):
            a, b_, c_ = pcall(carry[0], carry[1], ct0, carry[2])
            return (a, b_, c_), None
        (a, b_, c_), _ = jax.lax.scan(body, (qp0, qv0, f0), None, length=T)
        return a.sum()

    try:
        t0 = time.time()
        jax.block_until_ready(loop(jax.random.key(0)))
        comp = time.time() - t0
        # pipelined fresh-arg: enqueue 10, block once
        t0 = time.time()
        outs = [loop(jax.random.key(100 + i)) for i in range(10)]
        jax.block_until_ready(outs)
        per = (time.time() - t0) / 10
        # sequential fresh-arg
        ts = []
        for i in range(5):
            t0 = time.time(); jax.block_until_ready(loop(jax.random.key(200 + i))); ts.append(time.time() - t0)
        print(f"{name:<16} pipelined {per*1e3:8.2f} ms ({per*1e6/T:6.1f} us/step)  seq p50 {np.median(ts)*1e3:8.2f} ms  compile {comp:5.1f}s", flush=True)
    except Exception as e:
        print(f"{name:<16} FAIL: {type(e).__name__}: {str(e).splitlines()[0][:110]}", flush=True)
