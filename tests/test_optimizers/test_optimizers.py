"""Optimizer parity vs independent numpy formulations under shared noise.

The reference samples with np.random (judo/optimizers/ps.py:49) while we use
jax PRNG, so exact-sequence parity is checked by injecting the same noise
through ``sample_from_noise`` (the controls-match strategy from SURVEY §7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from judo_tpu.optimizers import (
    MPPI,
    CrossEntropyMethod,
    CrossEntropyMethodConfig,
    MPPIConfig,
    PredictiveSampling,
    PredictiveSamplingConfig,
    get_registered_optimizers,
)

R, N, NU = 16, 4, 3


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _np_ramp(noise_ramp, n):
    return noise_ramp * np.linspace(1 / n, 1, n)[:, None]


def test_ps_sample_and_update(rng):
    cfg = PredictiveSamplingConfig(num_rollouts=R, num_nodes=N, use_noise_ramp=True, noise_ramp=2.5, sigma=0.1)
    opt = PredictiveSampling(cfg, NU)
    nominal = rng.standard_normal((N, NU))
    noise = rng.standard_normal((R - 1, N, NU))

    samples, _ = opt.sample_from_noise(opt.params(), (), jnp.asarray(nominal), jnp.asarray(noise))
    expected = np.concatenate([nominal[None], nominal + _np_ramp(2.5, N) * 0.1 * noise])
    np.testing.assert_allclose(np.asarray(samples), expected, atol=1e-12)

    rewards = rng.standard_normal(R)
    new_nominal, _ = opt.update(opt.params(), (), samples, jnp.asarray(rewards))
    np.testing.assert_allclose(np.asarray(new_nominal), expected[np.argmax(rewards)], atol=1e-12)


def test_mppi_softmax_update(rng):
    cfg = MPPIConfig(num_rollouts=R, num_nodes=N, sigma=0.1, temperature=0.05)
    opt = MPPI(cfg, NU)
    samples = rng.standard_normal((R, N, NU))
    rewards = rng.standard_normal(R)

    costs = -rewards
    w = np.exp(-(costs - costs.min()) / 0.05)
    w /= w.sum()
    expected = (w[:, None, None] * samples).sum(0)

    got, _ = opt.update(opt.params(), (), jnp.asarray(samples), jnp.asarray(rewards))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-12)


def test_mppi_temperature_limits(rng):
    """temperature -> 0 approaches argmax; large temperature approaches mean."""
    samples = rng.standard_normal((R, N, NU))
    rewards = rng.standard_normal(R)
    cold = MPPI(MPPIConfig(num_rollouts=R, num_nodes=N, temperature=1e-8), NU)
    got, _ = cold.update(cold.params(), (), jnp.asarray(samples), jnp.asarray(rewards))
    np.testing.assert_allclose(np.asarray(got), samples[np.argmax(rewards)], atol=1e-6)

    hot = MPPI(MPPIConfig(num_rollouts=R, num_nodes=N, temperature=1e8), NU)
    got, _ = hot.update(hot.params(), (), jnp.asarray(samples), jnp.asarray(rewards))
    np.testing.assert_allclose(np.asarray(got), samples.mean(0), atol=1e-6)


def test_cem_state_threading(rng):
    cfg = CrossEntropyMethodConfig(
        num_rollouts=R, num_nodes=N, num_elites=3, sigma_min=0.05, sigma_max=0.5
    )
    opt = CrossEntropyMethod(cfg, NU)
    state = opt.init_state(jnp.float64)
    np.testing.assert_allclose(np.asarray(state["sigma"]), 0.275)

    nominal = rng.standard_normal((N, NU))
    noise = rng.standard_normal((R - 1, N, NU))
    samples, state = opt.sample_from_noise(opt.params(), state, jnp.asarray(nominal), jnp.asarray(noise))
    expected = np.concatenate([nominal[None], nominal + 0.275 * noise])
    np.testing.assert_allclose(np.asarray(samples), expected, atol=1e-12)

    rewards = rng.standard_normal(R)
    new_nominal, state = opt.update(opt.params(), state, samples, jnp.asarray(rewards))
    elite_inds = np.flip(np.argsort(rewards))[:3]
    elites = expected[elite_inds]
    np.testing.assert_allclose(np.asarray(new_nominal), elites.mean(0), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(state["sigma"]), np.clip(elites.std(0), 0.05, 0.5), atol=1e-12
    )


def test_cem_sigma_reinterp_on_node_change():
    cfg = CrossEntropyMethodConfig(num_rollouts=R, num_nodes=4)
    opt = CrossEntropyMethod(cfg, NU)
    state = opt.init_state(jnp.float64)
    state = {"sigma": state["sigma"] * jnp.linspace(0.5, 1.5, 4)[:, None]}
    old_t = jnp.linspace(0.0, 1.0, 4)
    new_t = jnp.linspace(0.0, 1.0, 6)
    new_state = opt.pre_optimization(opt.params(), state, old_t, new_t)
    assert new_state["sigma"].shape == (6, NU)
    # endpoints preserved under linear re-interp
    np.testing.assert_allclose(np.asarray(new_state["sigma"][0]), np.asarray(state["sigma"][0]))
    np.testing.assert_allclose(np.asarray(new_state["sigma"][-1]), np.asarray(state["sigma"][-1]))


def test_sampling_is_jittable_and_rollout0_is_nominal():
    for name, (opt_cls, cfg_cls) in get_registered_optimizers().items():
        cfg = cfg_cls(num_rollouts=8, num_nodes=4)
        opt = opt_cls(cfg, NU)
        state = opt.init_state(jnp.float64)
        nominal = jnp.ones((4, NU), jnp.float64)

        @jax.jit
        def go(state, nominal, key):
            return opt.sample(opt.params(), state, nominal, key)  # noqa: B023

        samples, _ = go(state, nominal, jax.random.key(0))
        assert samples.shape == (8, 4, NU), name
        np.testing.assert_allclose(np.asarray(samples[0]), np.asarray(nominal), err_msg=name)


def test_registry_contents():
    # Built-ins must always be present; other tests may register extras
    # (the registry is global, mirroring the reference's).
    regs = get_registered_optimizers()
    assert {"cem", "mppi", "ps"} <= set(regs)
