"""Smooth (constraint-free) dynamics pipeline in JAX.

Implements the MuJoCo computation stages — kinematics, CoM-centered quantities,
composite-rigid-body mass matrix, recursive Newton-Euler bias forces, passive
spring/damper forces, and actuation — from first principles for a single state;
batching is vmap, time is lax.scan (see step.py).

Tree loops run over bodies at *trace* time (nbody is tens at most), so the
compiled program is a flat fused graph with no dynamic control flow — the
XLA-friendly formulation. The per-dof mass-matrix assembly is one dense masked
matmul, which is where the MXU earns its keep once batched.

This replaces the reference's CPU-threaded `mujoco.rollout` / C++
`System::rollout` hot loops (judo/utils/mj_rollout_backend.py:84,
mujoco_extensions/system/system_class.cpp:272-331).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from judo_tpu.ops.math import quat_mul, quat_rotate, quat_to_mat
from judo_tpu.physics.model import BALL, FREE, HINGE, SLIDE, PhysicsModel, PhysicsState
from judo_tpu.physics.spatial import motion_cross, motion_cross_force, spatial_inertia


class Kinematics(NamedTuple):
    xpos: jnp.ndarray  # (nbody, 3) body frame origins
    xquat: jnp.ndarray  # (nbody, 4)
    xmat: jnp.ndarray  # (nbody, 3, 3)
    xipos: jnp.ndarray  # (nbody, 3) body CoM positions
    ximat: jnp.ndarray  # (nbody, 3, 3) inertial frame orientation
    xanchor: jnp.ndarray  # (njnt, 3)
    xaxis: jnp.ndarray  # (njnt, 3)
    geom_xpos: jnp.ndarray  # (ngeom, 3)
    geom_xmat: jnp.ndarray  # (ngeom, 3, 3)
    site_xpos: jnp.ndarray  # (nsite, 3)
    site_xmat: jnp.ndarray  # (nsite, 3, 3)


class ComQuants(NamedTuple):
    subtree_com: jnp.ndarray  # (nbody, 3)
    cinert: jnp.ndarray  # (nbody, 6, 6) spatial inertia about tree-root CoM
    cdof: jnp.ndarray  # (nv, 6) dof motion axes [ang; lin] about tree-root CoM


class Velocity(NamedTuple):
    cvel: jnp.ndarray  # (nbody, 6)
    cdof_dot: jnp.ndarray  # (nv, 6)


def _axis_angle_quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    half = 0.5 * angle
    return jnp.concatenate([jnp.cos(half)[None], axis * jnp.sin(half)], axis=0)


def kinematics(m: PhysicsModel, s: PhysicsState) -> Kinematics:
    """Forward kinematics (the semantics of mj_kinematics)."""
    dtype = s.qpos.dtype
    xpos = [jnp.zeros(3, dtype)]
    xquat = [jnp.array([1.0, 0, 0, 0], dtype)]
    xanchor = [None] * m.njnt
    xaxis = [None] * m.njnt

    for b in range(1, m.nbody):
        p = m.body_parentid[b]
        pos = xpos[p] + quat_rotate(xquat[p], m.body_pos[b])
        quat = quat_mul(xquat[p], m.body_quat[b])
        for k in range(m.body_jntnum[b]):
            j = m.body_jntadr[b] + k
            jt = m.jnt_type[j]
            qadr = m.jnt_qposadr[j]
            anchor = quat_rotate(quat, m.jnt_pos[j]) + pos
            axis = quat_rotate(quat, m.jnt_axis[j])
            if jt == FREE:
                pos = s.qpos[qadr : qadr + 3]
                quat = s.qpos[qadr + 3 : qadr + 7]
                quat = quat / jnp.linalg.norm(quat)
                anchor = pos
            elif jt == BALL:
                qloc = s.qpos[qadr : qadr + 4]
                qloc = qloc / jnp.linalg.norm(qloc)
                quat = quat_mul(quat, qloc)
                pos = anchor - quat_rotate(quat, m.jnt_pos[j])
            elif jt == SLIDE:
                pos = pos + axis * (s.qpos[qadr] - m.qpos0[qadr])
            elif jt == HINGE:
                angle = s.qpos[qadr] - m.qpos0[qadr]
                qloc = _axis_angle_quat(m.jnt_axis[j], angle)
                quat = quat_mul(quat, qloc)
                pos = anchor - quat_rotate(quat, m.jnt_pos[j])
            # axis must be recomputed after orientation updates for anchor use
            xanchor[j] = anchor
            xaxis[j] = quat_rotate(quat, m.jnt_axis[j]) if jt in (BALL, HINGE) else axis
        xpos.append(pos)
        xquat.append(quat)

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = quat_to_mat(xquat)
    if m.njnt:
        xanchor = jnp.stack(xanchor)
        xaxis = jnp.stack(xaxis)
    else:  # pragma: no cover - degenerate static scene
        xanchor = jnp.zeros((0, 3), dtype)
        xaxis = jnp.zeros((0, 3), dtype)

    iquat = quat_mul(xquat, m.body_iquat)
    xipos = xpos + quat_rotate(xquat, m.body_ipos)
    ximat = quat_to_mat(iquat)

    gb = jnp.asarray(m.geom_bodyid, dtype=jnp.int32)
    geom_xpos = xpos[gb] + jnp.einsum("gij,gj->gi", xmat[gb], m.geom_pos)
    geom_xmat = xmat[gb] @ quat_to_mat(m.geom_quat)
    sb = jnp.asarray(m.site_bodyid, dtype=jnp.int32)
    site_xpos = xpos[sb] + jnp.einsum("gij,gj->gi", xmat[sb], m.site_pos)
    site_xmat = xmat[sb] @ quat_to_mat(m.site_quat)

    return Kinematics(xpos, xquat, xmat, xipos, ximat, xanchor, xaxis, geom_xpos, geom_xmat, site_xpos, site_xmat)


def com_quantities(m: PhysicsModel, kin: Kinematics) -> ComQuants:
    """CoM-centered inertias and dof axes (the semantics of mj_comPos).

    All spatial quantities are expressed with world orientation about the
    subtree CoM of each kinematic tree's root body, matching MuJoCo's
    conditioning trick.
    """
    dtype = kin.xpos.dtype
    # subtree com: backward accumulation of mass-weighted body CoM positions.
    mass = m.body_mass
    mpos = mass[:, None] * kin.xipos
    sub_mass = [mass[b] for b in range(m.nbody)]
    sub_mpos = [mpos[b] for b in range(m.nbody)]
    for b in range(m.nbody - 1, 0, -1):
        p = m.body_parentid[b]
        sub_mass[p] = sub_mass[p] + sub_mass[b]
        sub_mpos[p] = sub_mpos[p] + sub_mpos[b]
    sub_mass_arr = jnp.stack(sub_mass)
    subtree_com = jnp.stack(sub_mpos) / jnp.maximum(sub_mass_arr, 1e-12)[:, None]

    # center of each body's tree root
    root_com = subtree_com[jnp.asarray(m.body_rootid)]  # (nbody, 3)

    # spatial inertia of each body about its tree-root CoM, world orientation
    inertia_world = kin.ximat @ (m.body_inertia[:, :, None] * kin.ximat.swapaxes(-1, -2))
    cinert = spatial_inertia(mass, inertia_world, kin.xipos - root_com)  # (nbody, 6, 6)

    # cdof: motion axes per dof about tree-root CoM
    cdofs = []
    for j in range(m.njnt):
        jt = m.jnt_type[j]
        b = m.jnt_bodyid[j]
        offset = kin.xanchor[j] - root_com[b]
        if jt == FREE:
            # 3 translations along world axes, then 3 rotations about body axes
            eye = jnp.eye(3, dtype=dtype)
            for i in range(3):
                cdofs.append(jnp.concatenate([jnp.zeros(3, dtype), eye[i]]))
            rot = quat_to_mat(kin.xquat[b])
            for i in range(3):
                ax = rot[:, i]
                cdofs.append(jnp.concatenate([ax, jnp.cross(ax, -offset)]))
        elif jt == BALL:
            rot = quat_to_mat(kin.xquat[b])
            for i in range(3):
                ax = rot[:, i]
                cdofs.append(jnp.concatenate([ax, jnp.cross(ax, -offset)]))
        elif jt == SLIDE:
            cdofs.append(jnp.concatenate([jnp.zeros(3, dtype), kin.xaxis[j]]))
        elif jt == HINGE:
            ax = kin.xaxis[j]
            cdofs.append(jnp.concatenate([ax, jnp.cross(ax, -offset)]))
    cdof = jnp.stack(cdofs) if cdofs else jnp.zeros((0, 6), dtype)
    return ComQuants(subtree_com, cinert, cdof)


def velocity(m: PhysicsModel, com: ComQuants, qvel: jnp.ndarray) -> Velocity:
    """Body spatial velocities and cdof time-derivatives (mj_comVel semantics)."""
    dtype = qvel.dtype
    cvel = [jnp.zeros(6, dtype)]
    cdof_dot = [None] * m.nv
    for b in range(1, m.nbody):
        v = cvel[m.body_parentid[b]]
        for k in range(m.body_jntnum[b]):
            j = m.body_jntadr[b] + k
            jt = m.jnt_type[j]
            d = m.jnt_dofadr[j]
            if jt == FREE:
                for i in range(3):
                    cdof_dot[d + i] = jnp.zeros(6, dtype)
                v = v + com.cdof[d] * qvel[d] + com.cdof[d + 1] * qvel[d + 1] + com.cdof[d + 2] * qvel[d + 2]
                for i in range(3, 6):
                    cdof_dot[d + i] = motion_cross(v, com.cdof[d + i])
                v = v + com.cdof[d + 3] * qvel[d + 3] + com.cdof[d + 4] * qvel[d + 4] + com.cdof[d + 5] * qvel[d + 5]
            elif jt == BALL:
                for i in range(3):
                    cdof_dot[d + i] = motion_cross(v, com.cdof[d + i])
                v = v + com.cdof[d] * qvel[d] + com.cdof[d + 1] * qvel[d + 1] + com.cdof[d + 2] * qvel[d + 2]
            else:  # SLIDE / HINGE
                cdof_dot[d] = motion_cross(v, com.cdof[d])
                v = v + com.cdof[d] * qvel[d]
        cvel.append(v)
    cdof_dot = jnp.stack(cdof_dot) if m.nv else jnp.zeros((0, 6), dtype)
    return Velocity(jnp.stack(cvel), cdof_dot)


def crb_mass_matrix(m: PhysicsModel, com: ComQuants) -> jnp.ndarray:
    """Dense joint-space mass matrix via composite-rigid-body (mj_crb semantics).

    M[i, j] = cdof_i . (CRB[body(i)] cdof_j) on the dof-ancestor sparsity
    pattern, assembled as one masked dense matmul (MXU-friendly when batched).
    """
    crb = [com.cinert[b] for b in range(m.nbody)]
    for b in range(m.nbody - 1, 0, -1):
        p = m.body_parentid[b]
        if p > 0:
            crb[p] = crb[p] + crb[b]
    crb = jnp.stack(crb)  # (nbody, 6, 6)

    dof_body = jnp.asarray(m.dof_bodyid)
    f = jnp.einsum("vab,vb->va", crb[dof_body], com.cdof)  # (nv, 6)
    dense = f @ com.cdof.T  # (nv, nv)
    mask = m.dof_ancestor_mask  # lower-triangular-ish ancestry mask
    lower = dense * mask
    mm = lower + lower.T - jnp.diag(jnp.diag(lower))
    return mm + jnp.diag(m.dof_armature)


def rne_bias(m: PhysicsModel, com: ComQuants, vel: Velocity, qvel: jnp.ndarray) -> jnp.ndarray:
    """Bias force C(q, qvel) via recursive Newton-Euler (mj_rne, flg_acc=0)."""
    dtype = qvel.dtype
    grav = jnp.where(m.gravity_enabled, 1.0, 0.0).astype(dtype) * m.gravity
    # world "acceleration" = -gravity trick
    cacc = [jnp.concatenate([jnp.zeros(3, dtype), -grav])]
    for b in range(1, m.nbody):
        p = m.body_parentid[b]
        a = cacc[p]
        d0, dn = m.body_dofadr[b], m.body_dofadr[b] + m.body_dofnum[b]
        if dn > d0:
            a = a + vel.cdof_dot[d0:dn].T @ qvel[d0:dn]
        cacc.append(a)
    # body forces
    cfrc = []
    for b in range(m.nbody):
        fv = com.cinert[b] @ cacc[b] + motion_cross_force(vel.cvel[b], com.cinert[b] @ vel.cvel[b])
        cfrc.append(fv)
    # backward accumulation
    for b in range(m.nbody - 1, 0, -1):
        p = m.body_parentid[b]
        if p > 0:
            cfrc[p] = cfrc[p] + cfrc[b]
        # note: subtree force for body b is cfrc[b] after children folded in
    # projection onto dofs
    qfrc_bias = jnp.zeros(m.nv, dtype)
    for b in range(1, m.nbody):
        d0, dn = m.body_dofadr[b], m.body_dofadr[b] + m.body_dofnum[b]
        if dn > d0:
            qfrc_bias = qfrc_bias.at[d0:dn].set(com.cdof[d0:dn] @ cfrc[b])
    return qfrc_bias


def passive_force(m: PhysicsModel, s: PhysicsState) -> jnp.ndarray:
    """Joint springs and dof dampers (mj_passive semantics, no tendons/fluids)."""
    dtype = s.qvel.dtype
    qfrc = -m.dof_damping * s.qvel
    for j in range(m.njnt):
        jt = m.jnt_type[j]
        qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        stiff = m.jnt_stiffness[j]
        if jt in (SLIDE, HINGE):
            qfrc = qfrc.at[dadr].add(-stiff * (s.qpos[qadr] - m.qpos_spring[qadr]))
        elif jt == BALL:
            # torque = -k * log(q_spring^-1 q), small-angle form via vector part
            q = s.qpos[qadr : qadr + 4]
            qs = m.qpos_spring[qadr : qadr + 4]
            dq = quat_mul(qs * jnp.array([1, -1, -1, -1], dtype), q)
            qfrc = qfrc.at[dadr : dadr + 3].add(-stiff * 2.0 * dq[1:])
        elif jt == FREE:
            qfrc = qfrc.at[dadr : dadr + 3].add(
                -stiff * (s.qpos[qadr : qadr + 3] - m.qpos_spring[qadr : qadr + 3])
            )
            q = s.qpos[qadr + 3 : qadr + 7]
            qs = m.qpos_spring[qadr + 3 : qadr + 7]
            dq = quat_mul(qs * jnp.array([1, -1, -1, -1], dtype), q)
            qfrc = qfrc.at[dadr + 3 : dadr + 6].add(-stiff * 2.0 * dq[1:])
    return qfrc


def actuation(m: PhysicsModel, s: PhysicsState, ctrl: jnp.ndarray) -> jnp.ndarray:
    """Actuator forces for joint-transmission gain/bias actuators.

    Covers MuJoCo <motor>, <position>, <velocity> (fixed gain + affine bias) on
    scalar joints, which is everything the reference task suite uses
    (position actuators throughout — e.g. judo/models/xml/cartpole.xml).
    """
    dtype = s.qvel.dtype
    ctrl = jnp.where(
        m.actuator_ctrllimited,
        jnp.clip(ctrl, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]),
        ctrl,
    )
    qfrc = jnp.zeros(m.nv, dtype)
    for u in range(m.nu):
        j = m.actuator_trnid[u]
        qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        gear = m.actuator_gear[u, 0]
        length = s.qpos[qadr] * gear
        vel = s.qvel[dadr] * gear
        gain = m.actuator_gainprm[u, 0]
        b0, b1, b2 = m.actuator_biasprm[u, 0], m.actuator_biasprm[u, 1], m.actuator_biasprm[u, 2]
        force = gain * ctrl[u] + b0 + b1 * length + b2 * vel
        force = jnp.where(
            m.actuator_forcelimited[u],
            jnp.clip(force, m.actuator_forcerange[u, 0], m.actuator_forcerange[u, 1]),
            force,
        )
        qfrc = qfrc.at[dadr].add(gear * force)
    return qfrc
