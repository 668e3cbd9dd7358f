"""Static-shape collision detection for primitive geom pairs.

MuJoCo's dynamic broadphase + per-pair narrowphase is replaced by the
XLA-friendly formulation: the candidate pair list is precomputed at model
lowering (model.py:_collision_pairs, using MuJoCo's contype/conaffinity and
body-exclusion rules), every candidate produces a *fixed* number of contact
slots each step, and inactive slots are masked by distance. This keeps all
shapes static under jit while supporting the reference task suite's contact
scenes (cylinder pushing, cube-in-hand, arm pick, quadruped feet).

Each contact slot carries the mixed MuJoCo contact parameters
(friction/solref/solimp per mj_contactParam's solmix/priority rules).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from judo_tpu.physics.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_CYLINDER,
    GEOM_PLANE,
    GEOM_SPHERE,
    PhysicsModel,
)
from judo_tpu.physics.smooth import Kinematics

_BIG = 1e10
_MINMU = 1e-5


class Contacts(NamedTuple):
    """Fixed-size contact set (ncon static)."""

    dist: jnp.ndarray  # (ncon,)
    pos: jnp.ndarray  # (ncon, 3)
    frame: jnp.ndarray  # (ncon, 3, 3) rows: [normal, tangent1, tangent2]
    includemargin: jnp.ndarray  # (ncon,)
    friction: jnp.ndarray  # (ncon,) sliding friction (isotropic)
    solref: jnp.ndarray  # (ncon, 2)
    solimp: jnp.ndarray  # (ncon, 5)
    body1: Tuple[int, ...]  # static
    body2: Tuple[int, ...]  # static


def _tangent_frame(n: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal frame rows [n, t1, t2] from a unit normal."""
    # pick the world axis least aligned with n
    ref = jnp.where(jnp.abs(n[0]) < 0.5, jnp.array([1.0, 0, 0], n.dtype), jnp.array([0.0, 1, 0], n.dtype))
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2])


def _num_slots(t1: int, t2: int) -> int:
    """Contact slots produced by a (type1, type2) pair (type1 <= type2)."""
    if t1 == GEOM_PLANE:
        return {GEOM_SPHERE: 1, GEOM_CAPSULE: 2, GEOM_CYLINDER: 2, GEOM_BOX: 4}.get(t2, 0)
    if t1 == GEOM_SPHERE:
        return 1 if t2 in (GEOM_SPHERE, GEOM_CAPSULE, GEOM_BOX) else 0
    if t1 == GEOM_CAPSULE:
        return 1 if t2 in (GEOM_CAPSULE, GEOM_BOX) else 0
    if t1 == GEOM_CYLINDER:
        return 2 if t2 == GEOM_CYLINDER else 0
    return 0


def num_contact_slots(m: PhysicsModel) -> int:
    return sum(_num_slots(m.geom_type[g1], m.geom_type[g2]) for g1, g2 in m.collision_pairs)


def empty_contacts(dtype) -> Contacts:
    """Zero-slot contact set (scenes with limits but no collisions)."""
    return Contacts(
        dist=jnp.zeros(0, dtype),
        pos=jnp.zeros((0, 3), dtype),
        frame=jnp.zeros((0, 3, 3), dtype),
        includemargin=jnp.zeros(0, dtype),
        friction=jnp.zeros(0, dtype),
        solref=jnp.zeros((0, 2), dtype),
        solimp=jnp.zeros((0, 5), dtype),
        body1=(),
        body2=(),
    )


def _closest_segment_point(a: jnp.ndarray, b: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    ab = b - a
    t = jnp.clip(jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-12), 0.0, 1.0)
    return a + t * ab


def _segment_segment(p1, q1, p2, q2):
    """Closest points between segments [p1,q1] and [p2,q2]."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-12, jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-12), 0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, 1e-12)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / jnp.maximum(a, 1e-12), 0.0, 1.0)
    return p1 + s * d1, p2 + t_cl * d2


def _pair_params(m: PhysicsModel, g1: int, g2: int):
    """Mixed contact parameters (mj_contactParam semantics)."""
    p1, p2 = m.geom_priority[g1], m.geom_priority[g2]
    if p1 != p2:
        g = g1 if p1 > p2 else g2
        mu = jnp.maximum(m.geom_friction[g, 0], _MINMU)
        return mu, m.geom_solref[g], m.geom_solimp[g], m.geom_margin[g] - m.geom_gap[g]
    mu = jnp.maximum(jnp.maximum(m.geom_friction[g1, 0], m.geom_friction[g2, 0]), _MINMU)
    s1, s2 = m.geom_solmix[g1], m.geom_solmix[g2]
    w1 = s1 / jnp.maximum(s1 + s2, 1e-12)
    w2 = 1.0 - w1
    # standard (positive) solref mixes linearly; direct (negative) takes min
    solref = jnp.where(
        jnp.logical_and(m.geom_solref[g1, 0] > 0, m.geom_solref[g2, 0] > 0),
        w1 * m.geom_solref[g1] + w2 * m.geom_solref[g2],
        jnp.minimum(m.geom_solref[g1], m.geom_solref[g2]),
    )
    solimp = w1 * m.geom_solimp[g1] + w2 * m.geom_solimp[g2]
    margin = jnp.maximum(m.geom_margin[g1], m.geom_margin[g2]) - jnp.maximum(m.geom_gap[g1], m.geom_gap[g2])
    return mu, solref, solimp, margin


def find_contacts(m: PhysicsModel, kin: Kinematics) -> Contacts:
    """Narrowphase over the static candidate pair list."""
    dtype = kin.xpos.dtype
    dists, poss, frames, margins, mus, solrefs, solimps = [], [], [], [], [], [], []
    body1, body2 = [], []

    def emit(g1, g2, dist, pos, normal):
        mu, solref, solimp, margin = _pair_params(m, g1, g2)
        dists.append(dist)
        poss.append(pos)
        frames.append(_tangent_frame(normal))
        margins.append(margin)
        mus.append(mu)
        solrefs.append(solref)
        solimps.append(solimp)
        body1.append(m.geom_bodyid[g1])
        body2.append(m.geom_bodyid[g2])

    no = jnp.asarray(_BIG, dtype)

    for g1, g2 in m.collision_pairs:
        t1, t2 = m.geom_type[g1], m.geom_type[g2]
        x1, x2 = kin.geom_xpos[g1], kin.geom_xpos[g2]
        r1mat, r2mat = kin.geom_xmat[g1], kin.geom_xmat[g2]
        size1, size2 = m.geom_size[g1], m.geom_size[g2]

        if t1 == GEOM_PLANE:
            n = r1mat[:, 2]  # plane normal = +z of plane frame

            def plane_dist(p):
                return jnp.dot(p - x1, n)

            if t2 == GEOM_SPHERE:
                d = plane_dist(x2) - size2[0]
                pos = x2 - n * (size2[0] + 0.5 * d)
                emit(g1, g2, d, pos, n)
            elif t2 == GEOM_CAPSULE:
                axis = r2mat[:, 2]
                for sgn in (-1.0, 1.0):
                    c = x2 + sgn * size2[1] * axis
                    d = plane_dist(c) - size2[0]
                    pos = c - n * (size2[0] + 0.5 * d)
                    emit(g1, g2, d, pos, n)
            elif t2 == GEOM_CYLINDER:
                axis = r2mat[:, 2]
                # deepest rim point of each end disc
                proj = axis * jnp.dot(axis, n) - n
                nproj = jnp.linalg.norm(proj)
                rim_dir = jnp.where(nproj > 1e-8, proj / jnp.maximum(nproj, 1e-12), r2mat[:, 0])
                for sgn in (-1.0, 1.0):
                    c = x2 + sgn * size2[1] * axis + size2[0] * rim_dir
                    d = plane_dist(c)
                    pos = c - 0.5 * d * n
                    emit(g1, g2, d, pos, n)
            elif t2 == GEOM_BOX:
                # 8 corner distances; keep the 4 deepest
                corners = []
                cdists = []
                for sx in (-1.0, 1.0):
                    for sy in (-1.0, 1.0):
                        for sz in (-1.0, 1.0):
                            corner = x2 + r2mat @ (size2 * jnp.asarray([sx, sy, sz], dtype))
                            corners.append(corner)
                            cdists.append(plane_dist(corner))
                cd = jnp.stack(cdists)
                cp = jnp.stack(corners)
                idx = jnp.argsort(cd)[:4]
                for k in range(4):
                    i = idx[k]
                    d = cd[i]
                    pos = cp[i] - 0.5 * d * n
                    emit(g1, g2, d, pos, n)
            else:
                for _ in range(_num_slots(t1, t2)):
                    emit(g1, g2, no, x2, jnp.array([0.0, 0, 1], dtype))

        elif t1 == GEOM_SPHERE:
            if t2 == GEOM_SPHERE:
                delta = x2 - x1
                dn = jnp.linalg.norm(delta)
                n = jnp.where(dn > 1e-9, delta / jnp.maximum(dn, 1e-12), jnp.array([0.0, 0, 1], dtype))
                d = dn - size1[0] - size2[0]
                pos = x1 + n * (size1[0] + 0.5 * d)
                emit(g1, g2, d, pos, n)
            elif t2 == GEOM_CAPSULE:
                axis = r2mat[:, 2]
                c = _closest_segment_point(x2 - size2[1] * axis, x2 + size2[1] * axis, x1)
                delta = c - x1
                dn = jnp.linalg.norm(delta)
                n = jnp.where(dn > 1e-9, delta / jnp.maximum(dn, 1e-12), jnp.array([0.0, 0, 1], dtype))
                d = dn - size1[0] - size2[0]
                pos = x1 + n * (size1[0] + 0.5 * d)
                emit(g1, g2, d, pos, n)
            elif t2 == GEOM_BOX:
                # sphere center in box frame
                local = r2mat.T @ (x1 - x2)
                clamped = jnp.clip(local, -size2, size2)
                inside = jnp.all(jnp.abs(local) < size2)
                # outside: closest surface point; inside: push out along min axis
                delta_out = local - clamped
                dn_out = jnp.linalg.norm(delta_out)
                n_out = delta_out / jnp.maximum(dn_out, 1e-12)
                gaps = size2 - jnp.abs(local)
                ax = jnp.argmin(gaps)
                sign = jnp.sign(local[ax])
                n_in = jnp.zeros(3, dtype).at[ax].set(sign)
                dn_in = -gaps[ax]
                n_local = jnp.where(inside, n_in, n_out)
                dn_loc = jnp.where(inside, dn_in, dn_out)
                n = r2mat @ (-n_local)  # normal from sphere(g1) toward box
                d = dn_loc - size1[0]
                surf = x2 + r2mat @ jnp.where(inside, local - dn_in * n_in, clamped)
                pos = surf + 0.5 * d * n
                emit(g1, g2, d, pos, n)
            else:
                for _ in range(_num_slots(t1, t2)):
                    emit(g1, g2, no, x2, jnp.array([0.0, 0, 1], dtype))

        elif t1 == GEOM_CAPSULE:
            if t2 == GEOM_CAPSULE:
                a1 = r1mat[:, 2]
                a2 = r2mat[:, 2]
                p1c, p2c = _segment_segment(
                    x1 - size1[1] * a1, x1 + size1[1] * a1, x2 - size2[1] * a2, x2 + size2[1] * a2
                )
                delta = p2c - p1c
                dn = jnp.linalg.norm(delta)
                n = jnp.where(dn > 1e-9, delta / jnp.maximum(dn, 1e-12), jnp.array([0.0, 0, 1], dtype))
                d = dn - size1[0] - size2[0]
                pos = p1c + n * (size1[0] + 0.5 * d)
                emit(g1, g2, d, pos, n)
            else:
                for _ in range(_num_slots(t1, t2)):
                    emit(g1, g2, no, x2, jnp.array([0.0, 0, 1], dtype))

        elif t1 == GEOM_CYLINDER and t2 == GEOM_CYLINDER:
            # parallel-axis radial contact (covers upright cylinders, e.g.
            # cylinder_push's pusher/cart; the general case falls back to none)
            a1 = r1mat[:, 2]
            a2 = r2mat[:, 2]
            parallel = jnp.abs(jnp.dot(a1, a2)) > 0.99
            delta = x2 - x1
            h = jnp.dot(delta, a1)
            radial = delta - a1 * h
            rn = jnp.linalg.norm(radial)
            n = jnp.where(rn > 1e-9, radial / jnp.maximum(rn, 1e-12), r1mat[:, 0])
            overlap = jnp.abs(h) < (size1[1] + size2[1])
            d_radial = rn - size1[0] - size2[0]
            d = jnp.where(jnp.logical_and(parallel, overlap), d_radial, no)
            # two contacts at the extremes of the axial overlap interval
            # (matches MuJoCo's manifold for parallel upright cylinders)
            h_lo = jnp.maximum(-size1[1], h - size2[1])
            h_hi = jnp.minimum(size1[1], h + size2[1])
            radial_pos = x1 + n * (size1[0] + 0.5 * d_radial)
            emit(g1, g2, d, radial_pos + a1 * h_hi, n)
            emit(g1, g2, d, radial_pos + a1 * h_lo, n)
        # unsupported combos contribute no slots (see _num_slots)

    n_slots = len(dists)
    if n_slots == 0:
        z3 = jnp.zeros((0, 3), dtype)
        return Contacts(
            jnp.zeros(0, dtype), z3, jnp.zeros((0, 3, 3), dtype), jnp.zeros(0, dtype),
            jnp.zeros(0, dtype), jnp.zeros((0, 2), dtype), jnp.zeros((0, 5), dtype), (), ()
        )
    return Contacts(
        dist=jnp.stack(dists),
        pos=jnp.stack(poss),
        frame=jnp.stack(frames),
        includemargin=jnp.stack(margins),
        friction=jnp.stack(mus),
        solref=jnp.stack(solrefs),
        solimp=jnp.stack(solimps),
        body1=tuple(body1),
        body2=tuple(body2),
    )
