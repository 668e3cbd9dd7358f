"""Constraint assembly and the contact/limit solver.

Implements MuJoCo's soft-constraint model (impedance d(r), reference
acceleration aref = -b*vel - k*d*pos, regularizer R = (1-d)/d * diagA) with a
pyramidal friction cone, and solves the dual box-constrained QP

    min_{f >= 0}  0.5 f^T (A + R) f + f^T (J qacc_smooth - aref),
    A = J M^-1 J^T

with fixed-iteration accelerated projected gradient descent (APGD). Unlike
sequential Gauss-Seidel sweeps, every APGD iteration is a dense matvec —
the formulation that vectorizes across the rollout batch on TPU. Constraint
counts are static (collision.py), so the whole solve jits into a fixed graph.

qacc = qacc_smooth + M^-1 J^T f recovers the constrained acceleration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from judo_tpu.physics.collision import Contacts
from judo_tpu.physics.model import HINGE, SLIDE, PhysicsModel, PhysicsState
from judo_tpu.physics.smooth import ComQuants, Kinematics

_MINIMP, _MAXIMP = 1e-4, 0.9999
_MINVAL = 1e-15


class ConstraintRows(NamedTuple):
    J: jnp.ndarray  # (nefc, nv)
    aref: jnp.ndarray  # (nefc,)
    reg: jnp.ndarray  # (nefc,) regularizer R diagonal
    active: jnp.ndarray  # (nefc,) 0/1 mask


def impedance(solimp: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """MuJoCo's constraint impedance d(r) (soft-constraint model docs)."""
    dmin, dmax, width, mid, power = (
        solimp[..., 0], solimp[..., 1], solimp[..., 2], solimp[..., 3], solimp[..., 4],
    )
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, _MINVAL), 0.0, 1.0)
    mid = jnp.clip(mid, _MINIMP, _MAXIMP)
    power = jnp.maximum(power, 1.0)
    lo = (mid ** (1.0 - power)) * x**power
    hi = 1.0 - ((1.0 - mid) ** (1.0 - power)) * (1.0 - x) ** power
    y = jnp.where(x <= mid, lo, hi)
    y = jnp.where(power == 1.0, x, y)
    return jnp.clip(dmin + y * (dmax - dmin), _MINIMP, _MAXIMP)


def kb_from_solref(
    solref: jnp.ndarray, solimp: jnp.ndarray, timestep: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stiffness/damping from solref (standard positive / direct negative).

    MuJoCo clamps the effective timeconst to >= 2*timestep (verified against
    efc_KBIP), which matters for coarse-timestep models like cylinder_push.
    """
    dmax = jnp.clip(solimp[..., 1], _MINIMP, _MAXIMP)
    timeconst = jnp.maximum(solref[..., 0], 2.0 * timestep)
    dampratio = solref[..., 1]
    k_std = 1.0 / jnp.maximum(dmax * dmax * timeconst * timeconst * dampratio * dampratio, _MINVAL)
    b_std = 2.0 / jnp.maximum(dmax * timeconst, _MINVAL)
    k = jnp.where(solref[..., 0] > 0, k_std, -solref[..., 0])
    b = jnp.where(solref[..., 0] > 0, b_std, -solref[..., 1])
    return k, b


def _point_jacobian(
    m: PhysicsModel, com: ComQuants, point: jnp.ndarray, body1: int, body2: int
) -> jnp.ndarray:
    """(3, nv) Jacobian of the relative linear velocity v(body2) - v(body1)
    at a world point, from the CoM-centered dof axes."""
    arm2 = point - com.subtree_com[m.body_rootid[body2]]
    arm1 = point - com.subtree_com[m.body_rootid[body1]]
    lin2 = com.cdof[:, 3:] + jnp.cross(com.cdof[:, :3], arm2[None, :])
    lin1 = com.cdof[:, 3:] + jnp.cross(com.cdof[:, :3], arm1[None, :])
    mask2 = m.body_dof_mask[body2][:, None]
    mask1 = m.body_dof_mask[body1][:, None]
    return (mask2 * lin2 - mask1 * lin1).T


def assemble_constraints(
    m: PhysicsModel,
    com: ComQuants,
    contacts: Contacts,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
) -> ConstraintRows:
    """Build efc rows: joint limits, then pyramidal contact facets."""
    dtype = qvel.dtype
    Js, arefs, regs, actives = [], [], [], []

    # --- joint limits on scalar joints (mj_instantiateLimit semantics) ---
    for j in range(m.njnt if m.limit_enabled else 0):
        if not m.jnt_limited[j] or m.jnt_type[j] not in (SLIDE, HINGE):
            continue
        qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        margin = m.jnt_margin[j]
        k, b = kb_from_solref(m.jnt_solref[j], m.jnt_solimp[j], m.timestep)
        inv_w = m.dof_invweight0[dadr]
        for sgn in (1.0, -1.0):
            # lower bound: dist = q - lo (J = +e); upper: dist = hi - q (J = -e)
            dist = jnp.where(sgn > 0, qpos[qadr] - m.jnt_range[j, 0], m.jnt_range[j, 1] - qpos[qadr])
            pos = dist - margin
            imp = impedance(m.jnt_solimp[j], pos)
            vel = sgn * qvel[dadr]
            Js.append(jnp.zeros(m.nv, dtype).at[dadr].set(sgn))
            arefs.append(-b * vel - k * imp * pos)
            regs.append((1.0 - imp) / jnp.maximum(imp, _MINIMP) * inv_w)
            actives.append((dist < margin).astype(dtype))

    # --- contacts: pyramidal facets (condim-3; frictionless handled by mu~0) ---
    ncon = contacts.dist.shape[0]
    for c in range(ncon):
        b1, b2 = contacts.body1[c], contacts.body2[c]
        jac = _point_jacobian(m, com, contacts.pos[c], b1, b2)  # (3, nv)
        n_row = contacts.frame[c, 0] @ jac
        t1_row = contacts.frame[c, 1] @ jac
        t2_row = contacts.frame[c, 2] @ jac
        mu = contacts.friction[c]
        pos = contacts.dist[c] - contacts.includemargin[c]
        imp = impedance(contacts.solimp[c], pos)
        k, b = kb_from_solref(contacts.solref[c], contacts.solimp[c], m.timestep)
        active = (contacts.dist[c] < contacts.includemargin[c]).astype(dtype)
        inv_w = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
        for t_row, s in ((t1_row, 1.0), (t1_row, -1.0), (t2_row, 1.0), (t2_row, -1.0)):
            row = n_row + s * mu * t_row
            vel = row @ qvel
            Js.append(row)
            arefs.append(-b * vel - k * imp * pos)
            # pyramidal diagApprox (matches mj efc_R): 2*invw*mu^2*(1+mu^2)
            diag_approx = jnp.maximum(2.0 * inv_w * mu * mu * (1.0 + mu * mu), _MINVAL)
            regs.append((1.0 - imp) / jnp.maximum(imp, _MINIMP) * diag_approx)
            actives.append(active)

    if not Js:
        return ConstraintRows(
            jnp.zeros((0, m.nv), dtype), jnp.zeros(0, dtype), jnp.ones(0, dtype), jnp.zeros(0, dtype)
        )
    return ConstraintRows(jnp.stack(Js), jnp.stack(arefs), jnp.stack(regs), jnp.stack(actives))


def solve_dual_qp(
    A: jnp.ndarray, b: jnp.ndarray, iterations: int
) -> jnp.ndarray:
    """min_{f>=0} 0.5 f^T A f + f^T b via APGD (Nesterov + adaptive restart)."""
    dtype = b.dtype
    nefc = b.shape[0]
    if nefc == 0:
        return b
    # Lipschitz bound: infinity norm of symmetric A
    L = jnp.maximum(jnp.max(jnp.sum(jnp.abs(A), axis=1)), _MINVAL)
    step = 1.0 / L

    def body(carry, _):
        f, y, t = carry
        grad = A @ y + b
        f_new = jnp.maximum(y - step * grad, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = f_new + ((t - 1.0) / t_new) * (f_new - f)
        # adaptive restart on non-descent
        restart = jnp.dot(grad, f_new - f) > 0
        y_new = jnp.where(restart, f_new, y_new)
        t_new = jnp.where(restart, jnp.asarray(1.0, dtype), t_new)
        return (f_new, y_new, t_new), None

    f0 = jnp.zeros(nefc, dtype)
    (f, _, _), _ = jax.lax.scan(body, (f0, f0, jnp.asarray(1.0, dtype)), None, length=iterations)
    return f


def solve_contacts(
    m: PhysicsModel,
    com: ComQuants,
    kin: Kinematics,
    contacts: Contacts,
    mm: jnp.ndarray,
    mm_factor,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    qacc_smooth: jnp.ndarray,
) -> jnp.ndarray:
    """Full constrained acceleration given smooth dynamics + contacts."""
    rows = assemble_constraints(m, com, contacts, qpos, qvel)
    nefc = rows.J.shape[0]
    if nefc == 0:
        return qacc_smooth

    J = rows.J * rows.active[:, None]
    aref = rows.aref * rows.active
    reg = jnp.where(rows.active > 0, rows.reg, 1.0)

    minv_jt = jax.scipy.linalg.cho_solve(mm_factor, J.T)  # (nv, nefc)
    A = J @ minv_jt + jnp.diag(reg)
    b = J @ qacc_smooth - aref
    f = solve_dual_qp(A, b, iterations=max(m.solver_iterations, 8))
    return qacc_smooth + minv_jt @ f
