"""Predictive sampling (reference: judo/optimizers/ps.py)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from judo_tpu.optimizers.base import Optimizer, OptimizerConfig


@dataclass
class PredictiveSamplingConfig(OptimizerConfig):
    sigma: float = 0.05


class PredictiveSampling(Optimizer[PredictiveSamplingConfig]):
    """Gaussian perturbations around the nominal; argmax-reward update."""

    def __init__(self, config: PredictiveSamplingConfig, nu: int) -> None:
        super().__init__(config, nu)

    def params(self) -> Any:
        return {"sigma": jnp.asarray(self.config.sigma)}

    def sample_from_noise(self, params: Any, state: Any, nominal: jnp.ndarray, noise: jnp.ndarray):
        """samples[0] = nominal; rest = nominal + sigma*noise (ps.py:49-50)."""
        sigma = params["sigma"]
        if self.use_noise_ramp:
            sigma = self._ramp(nominal.dtype) * sigma
        noised = nominal[None] + sigma * noise
        return jnp.concatenate([nominal[None], noised], axis=0), state

    def sample(self, params: Any, state: Any, nominal: jnp.ndarray, rng: jax.Array):
        noise = jax.random.normal(rng, (self.num_rollouts - 1, self.num_nodes, self.nu), nominal.dtype)
        return self.sample_from_noise(params, state, nominal, noise)

    def update(self, params: Any, state: Any, samples: jnp.ndarray, rewards: jnp.ndarray):
        """Argmax-reward selection (ps.py:64-65)."""
        return samples[jnp.argmax(rewards)], state
