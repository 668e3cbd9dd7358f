"""Small-matrix batched linear algebra tuned for TPU.

XLA's native Cholesky/triangular-solve lower to blocked While-loops sized for
128x128 tiles — catastrophic for the nv x nv (nv ~ 4-25) mass matrices this
engine factors twice per physics step (measured: ~25 ms/step at batch 320 on
v5e, dominated by these ops). Here the factorization and substitutions are
*unrolled over the static dimension* into ~4 ops per column, each of which
vectorizes cleanly across the rollout batch — turning the solve into O(nv)
tiny batched tensor ops instead of a tiled loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky(m: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular Cholesky factor of SPD ``m`` (..., n, n), unrolled."""
    n = m.shape[-1]
    l = jnp.zeros_like(m)  # noqa: E741
    for j in range(n):
        if j == 0:
            d = jnp.sqrt(m[..., 0, 0])
            l = l.at[..., 0, 0].set(d)
            if n > 1:
                l = l.at[..., 1:, 0].set(m[..., 1:, 0] / d[..., None])
        else:
            lj = l[..., j, :j]  # (..., j)
            d = jnp.sqrt(m[..., j, j] - jnp.sum(lj * lj, axis=-1))
            l = l.at[..., j, j].set(d)
            if j + 1 < n:
                below = m[..., j + 1 :, j] - jnp.einsum("...ik,...k->...i", l[..., j + 1 :, :j], lj)
                l = l.at[..., j + 1 :, j].set(below / d[..., None])
    return l


def solve_lower(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:  # noqa: E741
    """Solve L y = b by forward substitution. b: (..., n) or (..., n, k)."""
    n = l.shape[-1]
    vec = b.ndim == l.ndim - 1
    if vec:
        b = b[..., None]
    ys = []
    for j in range(n):
        rhs = b[..., j, :]
        if j:
            lj = l[..., j, :j]  # (..., j)
            acc = jnp.einsum("...k,...kc->...c", lj, jnp.stack(ys, axis=-2))
            rhs = rhs - acc
        ys.append(rhs / l[..., j, j][..., None])
    y = jnp.stack(ys, axis=-2)
    return y[..., 0] if vec else y


def solve_upper_t(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:  # noqa: E741
    """Solve L^T x = b by back substitution. b: (..., n) or (..., n, k)."""
    n = l.shape[-1]
    vec = b.ndim == l.ndim - 1
    if vec:
        b = b[..., None]
    xs: list = [None] * n
    for j in range(n - 1, -1, -1):
        rhs = b[..., j, :]
        if j + 1 < n:
            col = l[..., j + 1 :, j]  # (..., n-j-1): L^T[j, j+1:]
            acc = jnp.einsum("...k,...kc->...c", col, jnp.stack(xs[j + 1 :], axis=-2))
            rhs = rhs - acc
        xs[j] = rhs / l[..., j, j][..., None]
    x = jnp.stack(xs, axis=-2)
    return x[..., 0] if vec else x


def cho_solve(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:  # noqa: E741
    """Solve (L L^T) x = b given the factor from ``cholesky``."""
    return solve_upper_t(l, solve_lower(l, b))


def spd_solve(m: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """One-shot SPD solve."""
    return cho_solve(cholesky(m), b)


def cho_inverse(l: jnp.ndarray) -> jnp.ndarray:  # noqa: E741
    """Explicit inverse (L L^T)^-1 from the factor, symmetrized.

    Materializing M^-1 (n columns, n ~ 4-25) and applying it with matmuls is
    far cheaper on TPU than running the unrolled substitutions against wide
    right-hand sides (e.g. the (nv, nefc~280) contact-Jacobian transpose):
    the substitutions cost O(n) sequential tiny ops *per use*, the matmul is
    a single MXU-friendly op.
    """
    n = l.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=l.dtype), l.shape)
    inv = cho_solve(l, eye)
    return 0.5 * (inv + inv.swapaxes(-1, -2))
