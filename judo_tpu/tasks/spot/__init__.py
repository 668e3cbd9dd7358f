from judo_tpu.tasks.spot import spot_constants
from judo_tpu.tasks.spot.policy import SpotPolicy, build_observation, policy_rollout

__all__ = ["SpotPolicy", "build_observation", "policy_rollout", "spot_constants"]
