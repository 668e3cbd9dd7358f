from judo_tpu.parallel.mesh import make_rollout_mesh, rollout_sharding

__all__ = ["make_rollout_mesh", "rollout_sharding"]
