"""SpotBoxPush: push a large box to a goal (reference: judo/tasks/spot/spot_box_push.py)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
import numpy as np

from judo_tpu.tasks.spot import spot_constants as sc
from judo_tpu.tasks.spot.spot_base import SpotBase, SpotBaseConfig
from judo_tpu.utils.fields import np_1d_field

RADIUS_MIN, RADIUS_MAX = 1.0, 2.0


@dataclass
class SpotBoxPushConfig(SpotBaseConfig):
    w_goal: float = 60.0
    w_orientation: float = 15.0
    w_torso_proximity: float = 0.1
    w_gripper_proximity: float = 4.0
    orientation_threshold: float = 0.5
    fall_penalty: float = 2500.0
    w_controls: float = 0.0
    goal_position: np.ndarray = np_1d_field(
        np.array([0.0, 0.0, sc.BOX_HALF_LENGTH]),
        names=["x", "y", "z"],
        mins=[-5.0, -5.0, 0.0],
        maxs=[5.0, 5.0, 3.0],
        vis_name="goal_position",
        xyz_vis_indices=[0, 1, None],
    )


class SpotBoxPush(SpotBase[SpotBoxPushConfig]):
    name: str = "spot_box_push"
    config_t: type[SpotBoxPushConfig] = SpotBoxPushConfig  # type: ignore[assignment]

    def __init__(self, config: SpotBoxPushConfig | None = None) -> None:
        super().__init__(use_arm=True, config=config)
        self.object_pose_idx = self.get_joint_position_start_index("box_joint")
        self.object_y_axis_idx = self.get_sensor_start_index("object_y_axis")
        self.gripper_pos_idx = self.get_sensor_start_index("trace_fngr_site")

    def reward(
        self,
        states: jnp.ndarray,
        sensors: jnp.ndarray,
        controls: jnp.ndarray,
        params: dict[str, Any],
        system_metadata: dict[str, Any] | None = None,
    ) -> jnp.ndarray:
        """Goal + orientation + torso/gripper proximity + fall
        (spot_box_push.py:63-106)."""
        qpos = states[..., : self.model.nq]
        body_height = qpos[..., self.body_pose_idx + 2]
        body_pos = qpos[..., self.body_pose_idx : self.body_pose_idx + 3]
        object_pos = qpos[..., self.object_pose_idx : self.object_pose_idx + 3]
        object_y_axis = sensors[..., self.object_y_axis_idx : self.object_y_axis_idx + 3]
        gripper_pos = sensors[..., self.gripper_pos_idx : self.gripper_pos_idx + 3]
        z = jnp.asarray(sc.Z_AXIS, states.dtype)

        fallen = -params["fall_penalty"] * jnp.any(
            body_height <= params["spot_fallen_threshold"], axis=-1
        ).astype(states.dtype)
        goal = -params["w_goal"] * jnp.linalg.norm(
            object_pos - params["goal_position"][None, None], axis=-1
        ).mean(-1)
        orientation = -params["w_orientation"] * (
            (object_y_axis @ z) > params["orientation_threshold"]
        ).astype(states.dtype).sum(-1)
        # note: the reference's torso-proximity term is POSITIVE (keeps the
        # torso back from the box) — spot_box_push.py:92
        torso = params["w_torso_proximity"] * jnp.linalg.norm(body_pos - object_pos, axis=-1).mean(-1)
        gripper = -params["w_gripper_proximity"] * jnp.linalg.norm(
            gripper_pos - object_pos, axis=-1
        ).mean(-1)
        ctrl_cost = -params["w_controls"] * jnp.linalg.norm(controls, axis=-1).mean(-1)
        return fallen + goal + orientation + torso + gripper + ctrl_cost

    @property
    def reset_pose(self) -> np.ndarray:
        """Random ring reset for the box (spot_box_push.py:108-127)."""
        radius = RADIUS_MIN + (RADIUS_MAX - RADIUS_MIN) * np.random.rand()
        theta = 2 * np.pi * np.random.rand()
        object_xy = np.array([radius * np.cos(theta), radius * np.sin(theta)]) + np.random.randn(2)
        box_pose = np.array([*object_xy, sc.BOX_HALF_LENGTH, 1, 0, 0, 0])
        return np.array(
            [
                *np.random.randn(2), sc.STANDING_HEIGHT, 1, 0, 0, 0,
                *sc.LEGS_STANDING_POS, *self.reset_arm_pos, *box_pose,
            ]
        )
