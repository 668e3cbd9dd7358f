"""Cross-entropy method (reference: judo/optimizers/cem.py).

CEM's per-(node, nu) sigma matrix is mutable state in the reference
(cem.py:26-27); here it is an explicit carried pytree threaded through
sample/update, which is what makes the solver a pure function.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from judo_tpu.ops.splines import interp_linear
from judo_tpu.optimizers.base import Optimizer, OptimizerConfig


@dataclass
class CrossEntropyMethodConfig(OptimizerConfig):
    sigma_min: float = 0.1
    sigma_max: float = 1.0
    num_elites: int = 2


class CrossEntropyMethod(Optimizer[CrossEntropyMethodConfig]):
    """Elite-fit Gaussian: top-k mean -> nominal, clipped std -> sigma."""

    def __init__(self, config: CrossEntropyMethodConfig, nu: int) -> None:
        super().__init__(config, nu)

    @property
    def num_elites(self) -> int:
        return self.config.num_elites

    def params(self) -> Any:
        return {
            "sigma_min": jnp.asarray(self.config.sigma_min),
            "sigma_max": jnp.asarray(self.config.sigma_max),
        }

    def init_state(self, dtype=jnp.float32) -> Any:
        """sigma init to (sigma_min + sigma_max)/2 (cem.py:26-27)."""
        sigma0 = (self.config.sigma_min + self.config.sigma_max) / 2.0
        return {"sigma": jnp.full((self.num_nodes, self.nu), sigma0, dtype)}

    def pre_optimization(self, params: Any, state: Any, old_times: jnp.ndarray, new_times: jnp.ndarray) -> Any:
        """Re-interpolate sigma onto the new node grid (cem.py:44-53).

        The reference only re-interps when num_nodes changed; with static
        shapes that corresponds to a solver re-specialization, where the state
        is re-interpolated host-side (see controller). Shape-preserving calls
        are the identity here because old_times == new_times node counts.
        """
        if state["sigma"].shape[0] != new_times.shape[0]:
            state = {"sigma": interp_linear(old_times, state["sigma"], new_times)}
        return state

    def sample_from_noise(self, params: Any, state: Any, nominal: jnp.ndarray, noise: jnp.ndarray):
        sigma = state["sigma"]
        if self.use_noise_ramp:
            n = self.num_nodes
            ramp = jnp.linspace(
                self.config.noise_ramp / n, self.config.noise_ramp, n, dtype=nominal.dtype
            )[:, None]
            sigma = jnp.clip(sigma * ramp, params["sigma_min"], params["sigma_max"])
            state = {"sigma": sigma}
        noised = nominal[None] + sigma[None] * noise
        return jnp.concatenate([nominal[None], noised], axis=0), state

    def sample(self, params: Any, state: Any, nominal: jnp.ndarray, rng: jax.Array):
        noise = jax.random.normal(rng, (self.num_rollouts - 1, self.num_nodes, self.nu), nominal.dtype)
        return self.sample_from_noise(params, state, nominal, noise)

    def update(self, params: Any, state: Any, samples: jnp.ndarray, rewards: jnp.ndarray):
        """Top-k elite mean + clipped elite std (cem.py:88-92)."""
        _, elite_inds = jax.lax.top_k(rewards, self.num_elites)
        elites = samples[elite_inds]
        nominal = jnp.mean(elites, axis=0)
        sigma = jnp.clip(jnp.std(elites, axis=0), params["sigma_min"], params["sigma_max"])
        return nominal, {"sigma": sigma}
