"""SpotNavigate: drive the base to a goal (reference: judo/tasks/spot/spot_navigate.py)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
import numpy as np

from judo_tpu.tasks.spot import spot_constants as sc
from judo_tpu.tasks.spot.spot_base import SpotBase, SpotBaseConfig
from judo_tpu.utils.fields import np_1d_field


@dataclass
class SpotNavigateConfig(SpotBaseConfig):
    w_goal: float = 60.0
    fall_penalty: float = 2500.0
    w_controls: float = 0.0
    goal_position: np.ndarray = np_1d_field(
        np.array([0.0, 0.0, sc.STANDING_HEIGHT]),
        names=["x", "y", "z"],
        mins=[-5.0, -5.0, 0.0],
        maxs=[5.0, 5.0, 3.0],
        vis_name="goal_position",
        xyz_vis_indices=[0, 1, None],
    )


class SpotNavigate(SpotBase[SpotNavigateConfig]):
    """Navigate to a (GUI-draggable) goal; fall penalty keeps it honest."""

    name: str = "spot_navigate"
    config_t: type[SpotNavigateConfig] = SpotNavigateConfig  # type: ignore[assignment]

    def __init__(self, config: SpotNavigateConfig | None = None) -> None:
        super().__init__(use_arm=False, config=config)

    def reward(
        self,
        states: jnp.ndarray,
        sensors: jnp.ndarray,
        controls: jnp.ndarray,
        params: dict[str, Any],
        system_metadata: dict[str, Any] | None = None,
    ) -> jnp.ndarray:
        """Goal proximity + fall penalty + control cost (spot_navigate.py:50-76)."""
        qpos = states[..., : self.model.nq]
        i = self.body_pose_idx
        body_height = qpos[..., i + 2]
        body_pos = qpos[..., i : i + 3]

        fallen = -params["fall_penalty"] * jnp.any(
            body_height <= params["spot_fallen_threshold"], axis=-1
        ).astype(states.dtype)
        goal = -params["w_goal"] * jnp.linalg.norm(
            body_pos - params["goal_position"][None, None], axis=-1
        ).mean(-1)
        ctrl_cost = -params["w_controls"] * jnp.linalg.norm(controls, axis=-1).mean(-1)
        return fallen + goal + ctrl_cost

    @property
    def reset_pose(self) -> np.ndarray:
        return np.array(
            [0, 0, sc.STANDING_HEIGHT, 1, 0, 0, 0, *sc.LEGS_STANDING_POS, *self.reset_arm_pos]
        )
