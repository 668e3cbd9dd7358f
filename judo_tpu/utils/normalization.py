"""Action normalizers as pure functions with explicit state.

Semantics mirror judo/utils/normalization.py (identity / min-max over finite
ctrlrange dims / running Welford mean-std), but the running statistics are a
carried pytree instead of object attributes so the whole solve stays a pure
jitted function.
"""

from __future__ import annotations

import warnings
from typing import Any, Literal

import jax.numpy as jnp
import numpy as np

NormalizerType = Literal["none", "min_max", "running"]

_EPS = 1e-6


def make_normalizer_params(
    kind: NormalizerType,
    nu: int,
    ctrlrange: np.ndarray | None = None,
    init_std: float = 1.0,
    min_std: float = 1e-5,
    max_std: float = 1e3,
    dtype=jnp.float32,
) -> dict[str, Any]:
    """Static parameters for a normalizer kind."""
    if kind == "min_max":
        assert ctrlrange is not None
        lo = np.asarray(ctrlrange)[:, 0]
        hi = np.asarray(ctrlrange)[:, 1]
        finite = np.isfinite(lo) & np.isfinite(hi)
        if not finite.all():
            excluded = np.where(~finite)[0]
            warnings.warn(
                f"MinMax normalizer: {len(excluded)} action dims ({excluded.tolist()}) have "
                "infinite ctrlrange and will not be normalized.",
                UserWarning,
                stacklevel=2,
            )
        return {
            "min": jnp.asarray(np.where(finite, lo, 0.0), dtype),
            "max": jnp.asarray(np.where(finite, hi, 1.0), dtype),
            "finite": jnp.asarray(finite),
        }
    if kind == "running":
        return {
            "min_std": jnp.asarray(min_std, dtype),
            "max_std": jnp.asarray(max_std, dtype),
            "init_std": jnp.asarray(init_std, dtype),
        }
    return {}


def init_normalizer_state(kind: NormalizerType, nu: int, params: dict, dtype=jnp.float32) -> dict:
    if kind == "running":
        return {
            "count": jnp.zeros((), dtype),
            "mean": jnp.zeros(nu, dtype),
            "m2": jnp.zeros(nu, dtype),
            "std": jnp.ones(nu, dtype) * params["init_std"],
        }
    return {}


def normalize(kind: NormalizerType, params: dict, state: dict, x: jnp.ndarray) -> jnp.ndarray:
    if kind == "min_max":
        scaled = 2.0 * (x - params["min"]) / (params["max"] - params["min"]) - 1.0
        return jnp.where(params["finite"], scaled, x)
    if kind == "running":
        return (x - state["mean"]) / (state["std"] + _EPS)
    return x


def denormalize(kind: NormalizerType, params: dict, state: dict, x: jnp.ndarray) -> jnp.ndarray:
    if kind == "min_max":
        scaled = (x + 1.0) * (params["max"] - params["min"]) / 2.0 + params["min"]
        return jnp.where(params["finite"], scaled, x)
    if kind == "running":
        return x * state["std"] + state["mean"]
    return x


def update_normalizer(kind: NormalizerType, params: dict, state: dict, x: jnp.ndarray) -> dict:
    """Welford batch update (reference: normalization.py:175-203)."""
    if kind != "running":
        return state
    batch = x.reshape(-1, x.shape[-1])
    count = state["count"] + batch.shape[0]
    delta = batch - state["mean"]
    mean = state["mean"] + jnp.sum(delta, axis=0) / count
    delta2 = batch - mean
    m2 = jnp.maximum(state["m2"] + jnp.sum(delta * delta2, axis=0), 0.0)
    std = jnp.clip(jnp.sqrt(m2 / count), params["min_std"], params["max_std"])
    return {"count": count, "mean": mean, "m2": m2, "std": std}


normalizer_registry = ("none", "min_max", "running")
