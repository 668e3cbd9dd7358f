"""SpotTireRoll: roll an upright tire to a goal (reference: judo/tasks/spot/spot_tire_roll.py).

The tire uses the reference's own primitive proxy (cylinder r=0.33, hw=0.17 —
objects/tire/tire.xml object_primitive_approx) as its collision geometry.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
import numpy as np

from judo_tpu.tasks.spot import spot_constants as sc
from judo_tpu.tasks.spot.spot_base import SpotBase, SpotBaseConfig
from judo_tpu.utils.fields import np_1d_field


@dataclass
class SpotTireRollConfig(SpotBaseConfig):
    fall_penalty: float = 5000.0
    tire_fallen_threshold: float = 0.1
    w_goal: float = 60.0
    w_torso_proximity: float = 1.0
    torso_goal_offset: float = 1.0
    w_gripper_proximity: float = 1.0
    gripper_goal_offset: float = 0.15
    gripper_goal_altitude: float = 0.05
    w_tire_linear_velocity: float = 10.0
    w_tire_angular_velocity: float = 0.30
    w_controls: float = 0.0
    goal_position: np.ndarray = np_1d_field(
        np.array([0.0, 0.0, sc.TIRE_RADIUS]),
        names=["x", "y", "z"],
        mins=[-5.0, -5.0, 0.0],
        maxs=[5.0, 5.0, 3.0],
        vis_name="goal_position",
        xyz_vis_indices=[0, 1, None],
    )


class SpotTireRoll(SpotBase[SpotTireRollConfig]):
    name: str = "spot_tire_roll"
    config_t: type[SpotTireRollConfig] = SpotTireRollConfig  # type: ignore[assignment]

    def __init__(self, config: SpotTireRollConfig | None = None) -> None:
        super().__init__(use_arm=True, use_gripper=True, config=config)
        self.object_pose_idx = self.get_joint_position_start_index("tire_joint")
        self.gripper_pos_idx = self.get_sensor_start_index("trace_fngr_site")
        self.object_y_axis_idx = self.get_sensor_start_index("object_y_axis")
        self.object_vel_idx = int(self.model.jnt_dofadr[self.model.joint("tire_joint").id])

    def reward(
        self,
        states: jnp.ndarray,
        sensors: jnp.ndarray,
        controls: jnp.ndarray,
        params: dict[str, Any],
        system_metadata: dict[str, Any] | None = None,
    ) -> jnp.ndarray:
        """Goal + offset targets + velocity damping + fall terms
        (spot_tire_roll.py:73-137)."""
        qpos = states[..., : self.model.nq]
        qvel = states[..., self.model.nq :]

        body_height = qpos[..., self.body_pose_idx + 2]
        body_pos = qpos[..., self.body_pose_idx : self.body_pose_idx + 3]
        object_pos = qpos[..., self.object_pose_idx : self.object_pose_idx + 3]
        tire_linvel = qvel[..., self.object_vel_idx : self.object_vel_idx + 3]
        tire_angvel = qvel[..., self.object_vel_idx + 3 : self.object_vel_idx + 6]
        gripper_pos = sensors[..., self.gripper_pos_idx : self.gripper_pos_idx + 3]
        object_y_axis = sensors[..., self.object_y_axis_idx : self.object_y_axis_idx + 3]
        z = jnp.asarray(sc.Z_AXIS, states.dtype)

        tire_to_goal = params["goal_position"] - object_pos
        direction = tire_to_goal / (1e-2 + jnp.linalg.norm(tire_to_goal, axis=-1, keepdims=True))
        gripper_goal = object_pos - params["gripper_goal_offset"] * direction
        gripper_goal = gripper_goal.at[..., 2].set(params["gripper_goal_altitude"])
        torso_goal = object_pos - params["torso_goal_offset"] * direction

        fallen = -params["fall_penalty"] * jnp.any(
            body_height <= params["spot_fallen_threshold"], axis=-1
        ).astype(states.dtype)
        tire_fallen = -params["fall_penalty"] * (
            (object_y_axis @ z) > params["tire_fallen_threshold"]
        ).astype(states.dtype).sum(-1)
        goal = -params["w_goal"] * jnp.linalg.norm(
            object_pos - params["goal_position"], axis=-1
        ).mean(-1)
        torso = -params["w_torso_proximity"] * jnp.linalg.norm(body_pos - torso_goal, axis=-1).mean(-1)
        gripper = -params["w_gripper_proximity"] * jnp.linalg.norm(
            gripper_goal - gripper_pos, axis=-1
        ).mean(-1)
        ctrl_cost = -params["w_controls"] * jnp.linalg.norm(controls, axis=-1).mean(-1)
        linvel = -params["w_tire_linear_velocity"] * jnp.linalg.norm(tire_linvel, axis=-1).mean(-1)
        angvel = -params["w_tire_angular_velocity"] * jnp.linalg.norm(tire_angvel, axis=-1).mean(-1)
        return fallen + tire_fallen + goal + torso + gripper + ctrl_cost + linvel + angvel

    @property
    def reset_pose(self) -> np.ndarray:
        """Random tire placement away from the robot (spot_tire_roll.py:139-151)."""
        standing = np.array([0, 0, sc.STANDING_HEIGHT])
        tire = (np.random.rand(7) - 0.5) * 3.0
        tire[2] = sc.TIRE_RADIUS
        tire[3:] = [1, 0, 0, 0]
        while np.linalg.norm(tire[:3] - standing) < 1.0:
            tire = (np.random.rand(7) - 0.5) * 3.0
            tire[2] = sc.TIRE_RADIUS
            tire[3:] = [1, 0, 0, 0]
        return np.array([*standing, 1, 0, 0, 0, *sc.LEGS_STANDING_POS, *self.reset_arm_pos, *tire])
