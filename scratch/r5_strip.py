"""Round-5: stage ablation INSIDE the fused whole-rollout kernel.

Each variant = the production fused rollout structure (grid (tiles, T),
VMEM-carried state) with later stages of step_l disabled, so the deltas give
the per-stage device cost net of launch/tunnel overhead.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from judo_tpu.tasks.leap_cube import LeapCube

task = LeapCube()
pm = task.planning_model
nefc = 236
nq, nv, nu = pm.nq, pm.nv, pm.nu
class _LS: pass
le = ls = _LS()
def integrate_pos_l(*a): raise RuntimeError
implicit_damping_np = spd_inverse_blocks = bd_mat_vec = mat_vec_l = const_col = eye_mask = None
j_vec_chunked = jt_vec_chunked = solve_dual_qp_l = assemble_constraints_l = evaluate_sensors_l = None
find_contacts_l = num_noncontact_rows = None
R, T, TILE = 320, 100, 128
B = 384
h = float(np.asarray(pm.timestep))
ITERS = 10


def make_step(stage):
    def step(qp, qv, ctrl, f, v):
        if stage == "empty":
            qvn = qv * 0.999 + 1e-9 * jnp.sum(ctrl, axis=0)[None]
            return qp + 1e-9 * jnp.sum(qvn, axis=0)[None], qvn, f, v
        kin = le.kinematics_l(pm, qp)
        if stage == "kin":
            # consume kin so it isn't DCE'd; integrate to keep the carry alive
            acc = sum(jnp.sum(x, axis=0) for x in kin.xpos)
            qvn = qv + 1e-12 * acc[None]
            return integrate_pos_l(pm, qp, qvn, h), qvn, f, v
        com = le.com_l(pm, kin)
        vel = le.velocity_l(pm, com, qv)
        mm = le.crb_mass_matrix_l(pm, com)
        qfrc_bias = le.rne_bias_l(pm, com, vel, qv)
        qfrc_smooth = le.actuation_l(pm, qp, qv, ctrl) + le.passive_force_l(pm, qp, qv) - qfrc_bias
        minv = spd_inverse_blocks(pm, mm)
        minv_mv = lambda x: bd_mat_vec(minv, x)
        qacc_smooth = minv_mv(qfrc_smooth)
        sens = evaluate_sensors_l(pm, kin, qp, qv)
        if stage == "smooth":
            qacc = qacc_smooth + 1e-12 * jnp.sum(sens, axis=0)[None]
            fo, vo = f, v
        else:
            contacts = find_contacts_l(pm, kin)
            rows = assemble_constraints_l(pm, com, contacts, qp, qv)
            J = rows.J * rows.active[:, None, :]
            aref = rows.aref * rows.active
            reg = jnp.where(rows.active > 0, rows.reg, 1.0)
            b = j_vec_chunked(J, qacc_smooth) - aref
            if stage == "assemble":
                qacc = qacc_smooth + 1e-12 * minv_mv(jt_vec_chunked(J, b))
                fo, vo = b, v
            else:
                mus = None if pm.cone_pyramidal else [float(x) for x in contacts.friction]
                diag = jnp.where(rows.active > 0, rows.diag, 1.0)
                it = {"full": ITERS, "it5": 5, "it20": 20}[stage]
                fo, vo = solve_dual_qp_l(
                    J, minv, reg, b, it, f, "cw",
                    ncon_start=num_noncontact_rows(pm), mus=mus, diag=diag,
                    cw_v=v, in_pallas=True,
                )
                qacc = qacc_smooth + minv_mv(jt_vec_chunked(J, fo))
        damp = implicit_damping_np(pm)
        mh = mm + h * eye_mask(nv, qp.dtype) * const_col(damp, qp.dtype)[:, :, None]
        mh_blocks = spd_inverse_blocks(pm, mh)
        dv = bd_mat_vec(mh_blocks, h * mat_vec_l(mm, qacc))
        qvn = qv + dv
        return integrate_pos_l(pm, qp, qvn, h), qvn, fo, vo

    return step


def build(stage):
    step = make_step(stage)

    def kernel(qpos_ref, qvel_ref, ctrl_ref, oq_ref, ov_ref, qp_s, qv_s, f_s, v_s):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            qp_s[:] = qpos_ref[:]
            qv_s[:] = qvel_ref[:]
            f_s[:] = jnp.zeros_like(f_s)
            v_s[:] = jnp.ones_like(v_s)

        qp, qv, f, v = qp_s[:], qv_s[:], f_s[:], v_s[:]
        qp, qv, f, v = step(qp, qv, ctrl_ref[0], f, v)
        qp_s[:], qv_s[:] = qp, qv
        f_s[:] = f * 0 + f if f.shape == f_s.shape else f_s[:]
        v_s[:] = v if v.shape == v_s.shape else v_s[:]
        oq_ref[0] = qp
        ov_ref[0] = qv

    def rollout(qpos, qvel, ctrl):
        grid = (B // TILE, T)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nq, TILE), lambda i, t: (0, i)),
                pl.BlockSpec((nv, TILE), lambda i, t: (0, i)),
                pl.BlockSpec((1, nu, TILE), lambda i, t: (t, 0, i)),
            ],
            out_specs=(
                pl.BlockSpec((1, nq, TILE), lambda i, t: (t, 0, i)),
                pl.BlockSpec((1, nv, TILE), lambda i, t: (t, 0, i)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((T, nq, B), jnp.float32),
                jax.ShapeDtypeStruct((T, nv, B), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((nq, TILE), jnp.float32),
                pltpu.VMEM((nv, TILE), jnp.float32),
                pltpu.VMEM((nefc, TILE), jnp.float32),
                pltpu.VMEM((nefc, TILE), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    pltpu.GridDimensionSemantics.ARBITRARY,
                    pltpu.GridDimensionSemantics.ARBITRARY,
                ),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(qpos, qvel, ctrl)

    return rollout


rng = np.random.default_rng(0)
qp0 = jnp.asarray(np.tile(task.data.qpos, (B, 1)).T, jnp.float32)
qv0 = jnp.zeros((nv, B), jnp.float32)
mid = 0.5 * (task.actuator_ctrlrange[:, 0] + task.actuator_ctrlrange[:, 1])
ct = jnp.asarray(
    (mid[None, :, None] + 0.1 * rng.standard_normal((T, nu, B))), jnp.float32
)

import sys
stages = ["empty"]
for stage in stages:
    roll = jax.jit(build(stage))
    # timing loop below unchanged
    t0 = time.perf_counter()
    out = roll(qp0, qv0, ct)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    ts = []
    outs = []
    for _ in range(25):  # pipelined: hide the ~20 ms tunnel round trip
        t0 = time.perf_counter()
        outs.append(roll(qp0, qv0, ct))
        if len(outs) > 2:
            jax.block_until_ready(outs.pop(0))
        ts.append(time.perf_counter() - t0)
    jax.block_until_ready(outs)
    print("iters:", [f"{t*1e3:.1f}" for t in ts], flush=True)
    fin = bool(jnp.isfinite(out[0]).all())
    print(
        f"{stage:10s} p50 {np.median(ts)*1e3:8.2f} ms  ({np.median(ts)/T*1e6/ (B//TILE):6.1f} us/tile-step)"
        f"  compile {comp:6.1f}s finite={fin}",
        flush=True,
    )
