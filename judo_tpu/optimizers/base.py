"""Optimizer base: host-side configs + the pure-JAX sample/update interface.

The reference's optimizers are stateful numpy objects
(judo/optimizers/base.py:27-96). Here each optimizer is a *stateless* object
whose methods are pure functions suitable for jit:

    params()                                  -> dynamic hyperparam pytree
    init_state(nu, dtype)                     -> carried state pytree (CEM sigma, ...)
    sample(params, state, nominal, rng)       -> (samples (R,N,nu), state)
    update(params, state, samples, rewards)   -> (nominal (N,nu), state)
    pre_optimization(params, state, old_t, new_t) -> state

Shape-affecting config fields (num_rollouts, num_nodes, num_elites) are read
at trace time — changing them re-specializes the compiled solver (the
shape-bucketing strategy replacing the reference's live backend resizing,
judo/controller/controller.py:225-228). Value-only fields (sigma, temperature,
noise ramp) flow through ``params`` without recompilation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Generic, TypeVar

import jax
import jax.numpy as jnp

from judo_tpu.config import OverridableConfig
from judo_tpu.gui import slider


@slider("num_nodes", 3, 12, 1)
@dataclass
class OptimizerConfig(OverridableConfig):
    """Base optimizer config (reference parity: judo/optimizers/base.py:13-21)."""

    num_rollouts: int = 16
    num_nodes: int = 4
    use_noise_ramp: bool = False
    noise_ramp: float = 2.5


OptimizerConfigT = TypeVar("OptimizerConfigT", bound=OptimizerConfig)


class Optimizer(Generic[OptimizerConfigT]):
    """Base class for pure-JAX sampling optimizers."""

    def __init__(self, config: OptimizerConfigT, nu: int, override_task_name: str | None = None) -> None:
        self.config = config
        self.nu = nu
        if override_task_name is not None:
            self.config.set_override(override_task_name)

    # --- static shape accessors (read at trace time) ---
    @property
    def num_rollouts(self) -> int:
        return self.config.num_rollouts

    @property
    def num_nodes(self) -> int:
        return self.config.num_nodes

    @property
    def use_noise_ramp(self) -> bool:
        return self.config.use_noise_ramp

    # --- pure interface ---
    def params(self) -> Any:
        """Dynamic hyperparameters as a pytree (jit-traced, no recompile)."""
        return ()

    def init_state(self, dtype=jnp.float32) -> Any:
        """Carried optimizer state (empty for stateless algorithms)."""
        return ()

    def pre_optimization(self, params: Any, state: Any, old_times: jnp.ndarray, new_times: jnp.ndarray) -> Any:
        """Hook before each solve (reference: base.py:56-66)."""
        return state

    def stop_cond(self) -> bool:
        """Early-termination predicate (static; reference: base.py:68-74)."""
        return False

    def _ramp(self, dtype) -> jnp.ndarray:
        """Noise ramp column (reference: ps.py:44-48): ramp * linspace(1/N, 1, N)."""
        n = self.num_nodes
        return self.config.noise_ramp * jnp.linspace(1.0 / n, 1.0, n, dtype=dtype)[:, None]

    def sample(self, params: Any, state: Any, nominal: jnp.ndarray, rng: jax.Array) -> tuple[jnp.ndarray, Any]:
        raise NotImplementedError

    def update(self, params: Any, state: Any, samples: jnp.ndarray, rewards: jnp.ndarray) -> tuple[jnp.ndarray, Any]:
        raise NotImplementedError
