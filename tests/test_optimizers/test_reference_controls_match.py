"""Controls-match vs the reference optimizers under shared pre-generated noise.

BASELINE.md acceptance criterion: "controls must match the reference
optimizer's sequence within tolerance at the same horizon/num_samples/noise
schedule". The reference optimizers are pure numpy (judo/optimizers/{ps,mppi,
cem}.py); np.random vs jax PRNG differ, so identical noise is injected: the
reference consumes exactly one np.random.randn((R-1, N, nu)) per sample, and
the same draw feeds judo_tpu's sample_from_noise. Nominal-knot sequences are
then compared over several iterations, including the noise ramp and CEM's
carried sigma evolution.

Skipped when the reference checkout is unavailable (the repo stays
standalone); a minimal viser stub satisfies judo.gui's import so the numpy
optimizers load without the GUI stack.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

_REF = Path("/root/reference")


def _import_reference_optimizers():
    if not (_REF / "judo" / "optimizers").exists():
        pytest.skip("reference checkout not available")
    if "viser" not in sys.modules:
        stub = types.ModuleType("viser")
        for name in [
            "GuiCheckboxHandle", "GuiDropdownHandle", "GuiEvent", "GuiFolderHandle",
            "GuiInputHandle", "GuiSliderHandle", "MeshHandle", "ViserServer",
        ]:
            setattr(stub, name, type(name, (), {}))
        sys.modules["viser"] = stub
    if str(_REF) not in sys.path:
        sys.path.insert(0, str(_REF))
    from judo.optimizers.cem import CrossEntropyMethod, CrossEntropyMethodConfig
    from judo.optimizers.mppi import MPPI, MPPIConfig
    from judo.optimizers.ps import PredictiveSampling, PredictiveSamplingConfig

    return {
        "ps": (PredictiveSampling, PredictiveSamplingConfig),
        "mppi": (MPPI, MPPIConfig),
        "cem": (CrossEntropyMethod, CrossEntropyMethodConfig),
    }


def _ours():
    from judo_tpu.optimizers import (
        MPPI,
        CrossEntropyMethod,
        CrossEntropyMethodConfig,
        MPPIConfig,
        PredictiveSampling,
        PredictiveSamplingConfig,
    )

    return {
        "ps": (PredictiveSampling, PredictiveSamplingConfig),
        "mppi": (MPPI, MPPIConfig),
        "cem": (CrossEntropyMethod, CrossEntropyMethodConfig),
    }


def _fake_rewards(samples: np.ndarray, it: int) -> np.ndarray:
    """Deterministic reward standing in for the rollout stage."""
    return -np.square(samples - 0.1 * it).sum(axis=(1, 2))


@pytest.mark.parametrize("name", ["ps", "mppi", "cem"])
@pytest.mark.parametrize("use_ramp", [False, True])
def test_nominal_sequence_matches_reference(name, use_ramp):
    ref_reg = _import_reference_optimizers()
    our_reg = _ours()
    R, N, nu, iters = 16, 4, 3, 5

    ref_cls, ref_cfg_cls = ref_reg[name]
    our_cls, our_cfg_cls = our_reg[name]
    ref_cfg = ref_cfg_cls(num_rollouts=R, num_nodes=N, use_noise_ramp=use_ramp)
    our_cfg = our_cfg_cls(num_rollouts=R, num_nodes=N, use_noise_ramp=use_ramp)
    ref = ref_cls(ref_cfg, nu)
    ours = our_cls(our_cfg, nu)

    import jax.numpy as jnp

    params = ours.params()
    state = ours.init_state(jnp.float64)
    nominal_ref = np.linspace(-0.5, 0.5, N * nu).reshape(N, nu)
    nominal_our = jnp.asarray(nominal_ref)

    rng = np.random.default_rng(7)
    for it in range(iters):
        noise = rng.standard_normal((R - 1, N, nu))

        # the reference consumes exactly one np.random.randn per sample
        state_np = np.random.get_state()
        orig_randn = np.random.randn
        try:

            def fake_randn(*shape):
                assert shape == (R - 1, N, nu)
                return noise

            np.random.randn = fake_randn  # type: ignore[assignment]
            ref_samples = ref.sample_control_knots(nominal_ref)
        finally:
            np.random.randn = orig_randn  # restore the real function, never delete it
            np.random.set_state(state_np)

        our_samples, state = ours.sample_from_noise(params, state, nominal_our, jnp.asarray(noise))
        np.testing.assert_allclose(np.asarray(our_samples), ref_samples, rtol=1e-12, atol=1e-12)

        rewards = _fake_rewards(ref_samples, it)
        nominal_ref = ref.update_nominal_knots(ref_samples, rewards)
        nominal_our, state = ours.update(params, state, our_samples, jnp.asarray(rewards))
        np.testing.assert_allclose(np.asarray(nominal_our), nominal_ref, rtol=1e-6, atol=1e-9)

        if name == "cem":
            # carried sigma evolution must track the reference's mutable sigma
            np.testing.assert_allclose(np.asarray(state["sigma"]), ref.sigma, rtol=1e-6, atol=1e-9)
