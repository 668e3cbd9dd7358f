"""MPPI (reference: judo/optimizers/mppi.py; Information-Theoretic MPC alg. 2)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from judo_tpu.gui import slider
from judo_tpu.optimizers.base import Optimizer, OptimizerConfig


@slider("sigma", 0.001, 1.0, 0.01)
@slider("temperature", 0.001, 2.0, 0.05)
@dataclass
class MPPIConfig(OptimizerConfig):
    sigma: float = 0.1
    temperature: float = 0.05


class MPPI(Optimizer[MPPIConfig]):
    """Gaussian sampling; softmax-weighted average update."""

    def __init__(self, config: MPPIConfig, nu: int) -> None:
        super().__init__(config, nu)

    def params(self) -> Any:
        return {
            "sigma": jnp.asarray(self.config.sigma),
            "temperature": jnp.asarray(self.config.temperature),
        }

    def sample_from_noise(self, params: Any, state: Any, nominal: jnp.ndarray, noise: jnp.ndarray):
        sigma = params["sigma"]
        if self.use_noise_ramp:
            sigma = self._ramp(nominal.dtype) * sigma
        noised = nominal[None] + sigma * noise
        return jnp.concatenate([nominal[None], noised], axis=0), state

    def sample(self, params: Any, state: Any, nominal: jnp.ndarray, rng: jax.Array):
        noise = jax.random.normal(rng, (self.num_rollouts - 1, self.num_nodes, self.nu), nominal.dtype)
        return self.sample_from_noise(params, state, nominal, noise)

    def update(self, params: Any, state: Any, samples: jnp.ndarray, rewards: jnp.ndarray):
        """exp(-(cost-min)/temperature)-weighted knot average (mppi.py:73-82)."""
        costs = -rewards
        beta = jnp.min(costs)
        weights = jnp.exp(-(costs - beta) / params["temperature"])
        weights = weights / jnp.sum(weights)
        return jnp.sum(weights[:, None, None] * samples, axis=0), state
