"""judo_tpu: a TPU-native sampling-based MPC framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of bdaiinstitute/judo
(reference: /root/reference). The rollout+cost inner loop is a jitted, vmapped,
mesh-sharded pure function instead of CPU threads; physics is a batched JAX
rigid-body engine (models compiled host-side via MuJoCo's MJCF compiler, stepped
on-device); optimizers are pure sample/score/update transforms.

Reference entry point parity: judo/__init__.py (PACKAGE_ROOT / MODEL_PATH).
"""

from pathlib import Path

PACKAGE_ROOT = Path(__file__).parent
MODEL_PATH = PACKAGE_ROOT / "models"

__version__ = "0.1.0"

__all__ = ["PACKAGE_ROOT", "MODEL_PATH", "__version__"]
