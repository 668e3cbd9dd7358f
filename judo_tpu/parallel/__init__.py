from judo_tpu.parallel.mesh import (
    HOST_AXIS,
    ROLLOUT_AXIS,
    initialize_distributed,
    make_rollout_mesh,
    replicated,
    rollout_sharding,
)

__all__ = [
    "HOST_AXIS",
    "ROLLOUT_AXIS",
    "initialize_distributed",
    "make_rollout_mesh",
    "replicated",
    "rollout_sharding",
]
