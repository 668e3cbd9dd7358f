"""Cost kernels shared by task rewards.

Reference: judo/tasks/cost_functions.py:6-13 (numpy) -> jnp.
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_l1_norm(x: jnp.ndarray, p: float) -> jnp.ndarray:
    """Elementwise pseudo-Huber: sqrt(x^2 + p^2) - p."""
    return jnp.sqrt(jnp.square(x) + p * p) - p


def quadratic_norm(x: jnp.ndarray) -> jnp.ndarray:
    """0.5 * sum of squares over the trailing axis."""
    return 0.5 * jnp.sum(jnp.square(x), axis=-1)
