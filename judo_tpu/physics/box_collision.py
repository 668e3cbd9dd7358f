"""Box-box and capsule-box narrowphase in pure JAX (static shapes).

Box-box uses separating-axis minimization over the 15 candidate axes (6 face
normals + 9 edge-edge cross products) and, for face-dominant contacts, a fixed
Sutherland-Hodgman clip of the incident face against the reference face's side
planes — producing a masked 8-candidate manifold from which the 4 deepest
points are emitted. Edge-edge contacts collapse to a single point (slot 0).

Everything is branch-free (lax.select / where over fixed-size arrays) so one
compiled kernel serves every pair and batches under vmap — this is the
workhorse of the leap_cube / fr3 / spot contact scenes, replacing MuJoCo's
dynamic-count mjc_BoxBox.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PairContacts(NamedTuple):
    dist: jnp.ndarray  # (k,)
    pos: jnp.ndarray  # (k, 3)
    normal: jnp.ndarray  # (k, 3) from geom1 toward geom2


def _support(size: jnp.ndarray, rot: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """Half-projection of an oriented box onto a unit axis."""
    return jnp.sum(size * jnp.abs(rot.T @ axis))


def box_box(pos1, mat1, size1, pos2, mat2, size2) -> PairContacts:
    """4-slot contact manifold between two oriented boxes (world frame)."""
    dtype = pos1.dtype
    d = pos2 - pos1

    # --- candidate axes (world frame) ---
    axes = [mat1[:, i] for i in range(3)] + [mat2[:, j] for j in range(3)]
    edge_axes = []
    for i in range(3):
        for j in range(3):
            edge_axes.append(jnp.cross(mat1[:, i], mat2[:, j]))
    axes = axes + edge_axes  # 15
    axes = jnp.stack(axes)  # (15, 3)
    norms = jnp.linalg.norm(axes, axis=1)
    valid = norms > 1e-6
    axes_n = axes / jnp.maximum(norms, 1e-12)[:, None]

    proj1 = jnp.sum(size1 * jnp.abs(axes_n @ mat1), axis=1)  # (15,)
    proj2 = jnp.sum(size2 * jnp.abs(axes_n @ mat2), axis=1)
    sep = jnp.abs(axes_n @ d) - proj1 - proj2  # (15,) negative = overlapping
    # Edge axes get a tiny penalty so face axes win ties (standard SAT practice)
    bias = jnp.concatenate([jnp.zeros(6, dtype), jnp.full((9,), 1e-6, dtype)])
    score = jnp.where(valid, sep + bias, -jnp.inf)
    best = jnp.argmax(score)  # axis with LEAST penetration (max of negatives)
    dist = sep[jnp.argmax(jnp.where(valid, sep, -jnp.inf))]  # true max separation
    axis = axes_n[best]
    # orient the normal from box1 toward box2
    sign = jnp.where(jnp.dot(axis, d) >= 0, 1.0, -1.0)
    normal = sign * axis

    is_face = best < 6
    ref_is_1 = best < 3

    # --- face-face manifold ---
    # reference box (owns the reference face) and incident box
    ref_mat = jnp.where(ref_is_1, mat1, mat2)
    ref_size = jnp.where(ref_is_1, size1, size2)
    ref_pos = jnp.where(ref_is_1, pos1, pos2)
    inc_mat = jnp.where(ref_is_1, mat2, mat1)
    inc_size = jnp.where(ref_is_1, size2, size1)
    inc_pos = jnp.where(ref_is_1, pos2, pos1)
    # outward normal of the reference face (toward the incident box)
    ref_n = jnp.where(ref_is_1, normal, -normal)

    # local axis index of the reference face
    ref_align = jnp.abs(ref_mat.T @ ref_n)  # (3,)
    ref_ax = jnp.argmax(ref_align)
    ref_sign = jnp.sign(jnp.dot(ref_mat.T @ ref_n, jnp.eye(3, dtype=dtype)[ref_ax]) + 1e-12)

    # incident face: the face of the incident box most anti-parallel to ref_n
    inc_align = inc_mat.T @ ref_n  # (3,)
    inc_ax = jnp.argmax(jnp.abs(inc_align))
    inc_sign = -jnp.sign(inc_align[inc_ax] + 1e-12)  # face pointing against ref_n

    eye = jnp.eye(3, dtype=dtype)
    # incident face vertices (4) in world
    idx1 = (inc_ax + 1) % 3
    idx2 = (inc_ax + 2) % 3
    e_ax = eye[inc_ax]
    e_u = eye[idx1]
    e_v = eye[idx2]
    c_local = inc_sign * inc_size * e_ax
    u_local = inc_size * e_u
    v_local = inc_size * e_v
    signs = jnp.asarray([[1, 1], [1, -1], [-1, 1], [-1, -1]], dtype)
    verts_local = c_local + signs[:, 0:1] * u_local + signs[:, 1:2] * v_local  # (4,3)
    verts = inc_pos + verts_local @ inc_mat.T  # (4, 3) world

    # clip against the 4 side planes of the reference face (in ref local frame)
    vl = (verts - ref_pos) @ ref_mat  # (4, 3) in ref frame
    ridx1 = (ref_ax + 1) % 3
    ridx2 = (ref_ax + 2) % 3
    r_u = eye[ridx1]
    r_v = eye[ridx2]
    hu = jnp.sum(ref_size * r_u)
    hv = jnp.sum(ref_size * r_v)
    u = vl @ r_u  # (4,)
    v = vl @ r_v

    # Instead of true polygon clipping (dynamic vertex count), take the 4
    # incident vertices clamped into the reference face rectangle, plus depth
    # measured at the clamped point via the plane of the incident face.
    u_c = jnp.clip(u, -hu, hu)
    v_c = jnp.clip(v, -hv, hv)
    # reconstruct world points on the incident face at the clamped (u, v):
    # solve for the incident-face plane height along ref face normal
    w = vl @ eye[ref_ax]  # heights of incident verts in ref frame (4,)
    # The 4 verts lie exactly on the incident-face plane, so w is affine in
    # (u, v): w = w0 + gu*(u-u0) + gv*(v-v0). The plane normal (in ref-local
    # coords) comes from a single cross product of two in-plane edge vectors
    # (closed form; an lstsq here lowers to an SVD while-loop on TPU and
    # dominated the whole leap_cube step at ~20x the rest of narrowphase).
    n_pl = jnp.cross(vl[1] - vl[0], vl[2] - vl[0])
    n_u = jnp.dot(n_pl, r_u)
    n_v = jnp.dot(n_pl, r_v)
    n_w = jnp.dot(n_pl, eye[ref_ax])
    # |n_w| >= |n_pl|/sqrt(3) by construction (incident face is the most
    # anti-parallel one); the guard only protects degenerate zero-size boxes.
    n_w = jnp.sign(n_w + 1e-30) * jnp.maximum(jnp.abs(n_w), 1e-12)
    w_c = w[0] - (n_u * (u_c - u[0]) + n_v * (v_c - v[0])) / n_w
    h_ref = jnp.sum(ref_size * eye[ref_ax]) * ref_sign
    depth = ref_sign * w_c - jnp.sum(ref_size * eye[ref_ax])  # negative = below face

    # midpoint between face surface and incident point along ref axis
    mid_w = 0.5 * (w_c + h_ref)
    pts_ref_frame = u_c[:, None] * r_u[None, :] + v_c[:, None] * r_v[None, :] + mid_w[:, None] * eye[ref_ax][None, :]
    pts_world = ref_pos + pts_ref_frame @ ref_mat.T  # (4, 3)
    face_dists = depth  # (4,)

    # --- edge-edge single contact ---
    e1_ax = (best - 6) // 3
    e2_ax = (best - 6) % 3
    a1 = mat1[:, e1_ax % 3]
    a2 = mat2[:, e2_ax % 3]
    # supporting edge midpoints: move to the corner along the other two axes
    def edge_center(pos, mat, size, edge_axis_idx, toward):
        c = pos
        for k in range(3):
            ek = mat[:, k]
            mask = jnp.asarray(k, jnp.int32) != edge_axis_idx
            s = jnp.sign(jnp.dot(ek, toward) + 1e-12)
            sz = jnp.sum(size * jnp.eye(3, dtype=dtype)[k])
            c = c + jnp.where(mask, s * sz, 0.0) * ek
        return c

    c1 = edge_center(pos1, mat1, size1, e1_ax % 3, normal)
    c2 = edge_center(pos2, mat2, size2, e2_ax % 3, -normal)
    # closest points between the two infinite edge lines
    d12 = c2 - c1
    denom = jnp.maximum(1.0 - jnp.dot(a1, a2) ** 2, 1e-9)
    t1 = (jnp.dot(d12, a1) - jnp.dot(d12, a2) * jnp.dot(a1, a2)) / denom
    t2 = -(jnp.dot(d12, a2) - jnp.dot(d12, a1) * jnp.dot(a1, a2)) / denom
    p1 = c1 + t1 * a1
    p2 = c2 + t2 * a2
    edge_pt = 0.5 * (p1 + p2)

    # --- combine: 4 slots ---
    big = jnp.asarray(1e10, dtype)
    sep_positive = dist >= 0  # separated: keep slots inactive but report dist
    face_pts = pts_world
    face_d = jnp.where(face_dists < 0, face_dists, jnp.maximum(face_dists, dist))
    edge_pts = jnp.concatenate([edge_pt[None], jnp.tile(edge_pt[None], (3, 1))])
    edge_d = jnp.concatenate([dist[None], jnp.full((3,), big, dtype)])

    pts = jnp.where(is_face, face_pts, edge_pts)
    dists = jnp.where(is_face, face_d, edge_d)
    # when fully separated, emit the true distance on slot 0 only
    dists = jnp.where(
        sep_positive, jnp.concatenate([dist[None], jnp.full((3,), big, dtype)]), dists
    )
    normals = jnp.tile(normal[None], (4, 1))
    return PairContacts(dist=dists, pos=pts, normal=normals)


def capsule_box(pos_c, mat_c, size_c, pos_b, mat_b, size_b) -> PairContacts:
    """2-slot capsule-vs-box contact via sphere checks at the deepest segment
    points (endpoints + the segment point closest to the box center)."""
    dtype = pos_c.dtype
    r, hl = size_c[0], size_c[1]
    axis = mat_c[:, 2]
    ends = jnp.stack([pos_c - hl * axis, pos_c + hl * axis])  # (2, 3)

    # segment point closest to box center (good proxy for deepest interior pt)
    t = jnp.clip(jnp.dot(pos_b - pos_c, axis), -hl, hl)
    mid = pos_c + t * axis
    cands = jnp.concatenate([ends, mid[None]])  # (3, 3)

    local = (cands - pos_b) @ mat_b  # (3, 3) in box frame
    clamped = jnp.clip(local, -size_b, size_b)
    delta = local - clamped
    dn = jnp.linalg.norm(delta, axis=1)
    outside = dn > 1e-9
    # inside: push out along the smallest gap axis
    gaps = size_b - jnp.abs(local)  # (3, 3)
    ax = jnp.argmin(gaps, axis=1)
    eye = jnp.eye(3, dtype=dtype)
    n_in_local = jnp.sign(jnp.take_along_axis(local, ax[:, None], 1)) * eye[ax]
    d_in = -jnp.take_along_axis(gaps, ax[:, None], 1)[:, 0]
    n_out_local = delta / jnp.maximum(dn, 1e-12)[:, None]
    n_local = jnp.where(outside[:, None], n_out_local, n_in_local)
    dists = jnp.where(outside, dn, d_in) - r
    # normal points from capsule toward box: -n_local in world
    normals = -(n_local @ mat_b.T)
    surf_local = jnp.where(outside[:, None], clamped, local - d_in[:, None] * n_in_local)
    surf = pos_b + surf_local @ mat_b.T
    pts = surf + 0.5 * dists[:, None] * normals

    # keep the deepest 2 of the 3 candidates
    order = jnp.argsort(dists)[:2]
    return PairContacts(dist=dists[order], pos=pts[order], normal=normals[order])
