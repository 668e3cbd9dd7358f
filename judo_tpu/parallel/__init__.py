from judo_tpu.parallel.mesh import ROLLOUT_AXIS, make_rollout_mesh, replicated, rollout_sharding

__all__ = ["ROLLOUT_AXIS", "make_rollout_mesh", "replicated", "rollout_sharding"]
