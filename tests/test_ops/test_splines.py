"""Spline parity vs scipy.interpolate.interp1d (the reference's spline engine).

Reference semantics: judo/controller/controller.py:382-401 — interp1d over
axis=-2 with fill_value=(first knot, last knot), bounds_error=False.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import interp1d

from judo_tpu.ops.splines import eval_spline, interp_linear


def _reference_spline(ts, knots, order):
    fill_value = (knots[..., 0, :], knots[..., -1, :])
    return interp1d(ts, knots, kind=order, axis=-2, fill_value=fill_value, bounds_error=False)


@pytest.mark.parametrize("order", ["zero", "linear", "cubic"])
@pytest.mark.parametrize("batch", [(), (7,), (4, 3)])
def test_matches_scipy(order, batch):
    rng = np.random.default_rng(42)
    n, nu = 6, 2
    ts = np.sort(rng.uniform(0, 2, n))
    ts[0], ts[-1] = 0.0, 2.0
    knots = rng.standard_normal(batch + (n, nu))
    # queries inside, at knots, and outside both ends
    tq = np.concatenate([np.linspace(-0.5, 2.5, 31), ts])

    expected = _reference_spline(ts, knots, order)(tq)
    got = np.asarray(eval_spline(jnp.asarray(ts), jnp.asarray(knots), jnp.asarray(tq), order))
    np.testing.assert_allclose(got, expected, atol=1e-9)


@pytest.mark.parametrize("order", ["zero", "linear", "cubic"])
def test_uniform_grid_shifted_queries(order):
    """The controller's access pattern: uniform knot grid, shifted query times."""
    rng = np.random.default_rng(1)
    n, nu, horizon = 4, 3, 1.0
    t0 = 12.34
    ts = t0 + np.linspace(0, horizon, n)
    knots = rng.standard_normal((16, n, nu))
    tq = t0 + 0.05 + 0.01 * np.arange(100)

    expected = _reference_spline(ts, knots, order)(tq)
    got = np.asarray(eval_spline(jnp.asarray(ts), jnp.asarray(knots), jnp.asarray(tq), order))
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_interp_linear_extrapolates():
    """CEM sigma re-interpolation parity (judo/optimizers/cem.py:44-53)."""
    rng = np.random.default_rng(2)
    old_ts = np.linspace(0.0, 1.0, 5)
    sig = rng.uniform(0.1, 1.0, (5, 4))
    new_ts = np.linspace(-0.2, 1.3, 8)
    expected = interp1d(old_ts, sig, axis=0, kind="linear", fill_value="extrapolate")(new_ts)
    got = np.asarray(interp_linear(jnp.asarray(old_ts), jnp.asarray(sig), jnp.asarray(new_ts)))
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_cubic_requires_4_knots():
    with pytest.raises(ValueError):
        eval_spline(jnp.arange(3.0), jnp.zeros((3, 1)), jnp.zeros(2), "cubic")


def test_jit_and_vmap_compatible():
    import jax

    ts = jnp.linspace(0, 1, 4)
    knots = jnp.ones((8, 4, 2))
    tq = jnp.linspace(0, 1, 25)
    f = jax.jit(lambda k: eval_spline(ts, k, tq, "cubic"))
    out = f(knots)
    assert out.shape == (8, 25, 2)
    out2 = jax.vmap(lambda k: eval_spline(ts, k, tq, "linear"))(knots)
    assert out2.shape == (8, 25, 2)
