"""Device-mesh data parallelism over the rollout batch.

The reference's only parallel axis is the candidate-rollout batch, executed as
R CPU threads (judo/utils/mj_rollout_backend.py:32-88, SURVEY §2.2). On TPU the
same axis shards over the ICI mesh: the solver annotates candidate tensors with
a NamedSharding over the "rollouts" axis and lets XLA/GSPMD partition the
vmapped physics and insert the reward-reduction collectives (argmax / softmax
normalization / top_k ride ICI).

Scaling from 1 chip to a pod slice is therefore a mesh-shape change, not a
code change; multi-host extends the same mesh over DCN via jax.distributed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

ROLLOUT_AXIS = "rollouts"


def make_rollout_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1D mesh over the rollout-batch axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ROLLOUT_AXIS,))


def rollout_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (R, ...) tensors: batch split over the mesh."""
    return NamedSharding(mesh, PartitionSpec(ROLLOUT_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
