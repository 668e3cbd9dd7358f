"""6D spatial algebra in MuJoCo's convention: motion/force vectors are
[angular(3); linear(3)] stacked, expressed in the world frame about a common
origin. Spatial inertias are explicit symmetric 6x6 matrices; model sizes here
are tiny (nbody < 40), so explicit matrices trade negligible FLOPs for clarity
and batch cleanly under vmap.
"""

from __future__ import annotations

import jax.numpy as jnp


def cross_mat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector, batched over leading dims."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def motion_cross(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product v x m (both [ang; lin])."""
    ang = jnp.cross(v[..., :3], m[..., :3])
    lin = jnp.cross(v[..., :3], m[..., 3:]) + jnp.cross(v[..., 3:], m[..., :3])
    return jnp.concatenate([ang, lin], axis=-1)


def motion_cross_force(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion-cross-force product v x* f."""
    ang = jnp.cross(v[..., :3], f[..., :3]) + jnp.cross(v[..., 3:], f[..., 3:])
    lin = jnp.cross(v[..., :3], f[..., 3:])
    return jnp.concatenate([ang, lin], axis=-1)


def spatial_inertia(mass: jnp.ndarray, inertia_mat: jnp.ndarray, com: jnp.ndarray) -> jnp.ndarray:
    """Spatial inertia (6,6) about the origin for a body with CoM at ``com``.

    mass: (...,), inertia_mat: (...,3,3) about CoM in world axes, com: (...,3).

        I = [ Ic + m c^ c^T   m c^ ]
            [ m c^T           m 1  ]
    """
    c = cross_mat(com)
    m = mass[..., None, None]
    eye = jnp.eye(3, dtype=com.dtype)
    top_left = inertia_mat + m * c @ c.swapaxes(-1, -2)
    top_right = m * c
    bot_left = m * c.swapaxes(-1, -2)
    bot_right = m * jnp.broadcast_to(eye, c.shape)
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
