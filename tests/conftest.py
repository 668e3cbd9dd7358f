"""Test fixtures.

Mirrors the reference test strategy (tests/conftest.py there) plus TPU-build
additions: tests run on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware, and x64 is enabled so numeric parity against
CPU MuJoCo / scipy references can be checked tightly.
"""

import os

# Force CPU with 8 virtual devices so sharding tests exercise a real mesh.
# The ambient environment registers a TPU tunnel platform at interpreter
# startup (sitecustomize imports jax), so env vars are too late — use
# jax.config before any backend is initialized.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

# judo_tpu's __init__ enables the TPU compile cache based on this env var;
# mark the process as CPU so cached remote-compiled executables are not used
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# CPU-only persistent compile cache for the test suite: solve compiles
# dominate suite wall time (heaviest single test: 440 s, ~all compile).
# Separate from the TPU cache dir on purpose — remote-compiled TPU
# executables must never be reused by CPU processes (see judo_tpu/__init__).
jax.config.update("jax_compilation_cache_dir", "/tmp/judo_tpu_xla_cache_cpu_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from contextlib import contextmanager  # noqa: E402
from typing import Generator  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@contextmanager
def _temp_np_seed(seed: int) -> Generator[None, None, None]:
    """Seed numpy's global RNG, restoring prior state on exit.

    Parity with reference tests/conftest.py:12-26.
    """
    state = np.random.get_state()
    try:
        np.random.seed(seed)
        yield
    finally:
        np.random.set_state(state)


@pytest.fixture
def temp_np_seed():
    return _temp_np_seed


@pytest.fixture(autouse=True)
def _clear_override_registry():
    """Isolate the global config-override registry between tests."""
    from judo_tpu.config import clear_override_registry

    clear_override_registry()
    yield
    clear_override_registry()


@pytest.fixture
def task_text_xml_path(tmp_path):
    """Minimal inline MJCF used by index/task tests (no external assets).

    Same role as reference tests/conftest.py:29-69 (content written fresh).
    """
    xml = """
<mujoco model=\"test_box\">
  <option timestep=\"0.02\"/>
  <worldbody>
    <body name=\"box\" pos=\"0 0 0\">
      <joint name=\"jx\" type=\"slide\" axis=\"1 0 0\"/>
      <joint name=\"jy\" type=\"slide\" axis=\"0 1 0\"/>
      <joint name=\"jz\" type=\"slide\" axis=\"0 0 1\"/>
      <geom name=\"box_geom\" type=\"box\" size=\"0.1 0.1 0.1\" mass=\"1\"/>
      <site name=\"trace_site\" pos=\"0 0 0\" size=\"0.01\"/>
    </body>
  </worldbody>
  <actuator>
    <position name=\"ax\" joint=\"jx\" kp=\"10\" ctrlrange=\"-1 1\"/>
    <position name=\"ay\" joint=\"jy\" kp=\"10\" ctrlrange=\"-1 1\"/>
    <position name=\"az\" joint=\"jz\" kp=\"10\" ctrlrange=\"-1 1\"/>
  </actuator>
  <sensor>
    <framepos name=\"trace_site\" objtype=\"site\" objname=\"trace_site\"/>
  </sensor>
</mujoco>
"""
    p = tmp_path / "test_box.xml"
    p.write_text(xml)
    return str(p)
