"""Parity tests for quaternion math vs independent numpy formulations."""

import jax.numpy as jnp
import numpy as np
import pytest

from judo_tpu.ops import math as m


def _np_quat_mul(u, v):
    w = u[..., 0] * v[..., 0] - u[..., 1] * v[..., 1] - u[..., 2] * v[..., 2] - u[..., 3] * v[..., 3]
    x = u[..., 0] * v[..., 1] + u[..., 1] * v[..., 0] + u[..., 2] * v[..., 3] - u[..., 3] * v[..., 2]
    y = u[..., 0] * v[..., 2] - u[..., 1] * v[..., 3] + u[..., 2] * v[..., 0] + u[..., 3] * v[..., 1]
    z = u[..., 0] * v[..., 3] + u[..., 1] * v[..., 2] - u[..., 2] * v[..., 1] + u[..., 3] * v[..., 0]
    return np.stack([w, x, y, z], axis=-1)


def _rand_quats(shape, rng):
    q = rng.standard_normal(shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quat_mul_matches_numpy(rng):
    u = _rand_quats((5, 3), rng)
    v = _rand_quats((5, 3), rng)
    np.testing.assert_allclose(np.asarray(m.quat_mul(jnp.asarray(u), jnp.asarray(v))), _np_quat_mul(u, v), atol=1e-12)


def test_quat_inv_roundtrip(rng):
    q = _rand_quats((10,), rng)
    ident = m.quat_mul(jnp.asarray(q), m.quat_inv(jnp.asarray(q)))
    expected = np.tile(np.array([1.0, 0, 0, 0]), (10, 1))
    np.testing.assert_allclose(np.asarray(ident), expected, atol=1e-12)


def test_quat_diff_so3_small_angles(rng):
    # For small relative rotations, the log map ~ 2*vec part.
    q = _rand_quats((8,), rng)
    w = 1e-4 * rng.standard_normal((8, 3))
    dq = np.concatenate([np.ones((8, 1)), 0.5 * w], axis=-1)
    dq /= np.linalg.norm(dq, axis=-1, keepdims=True)
    v = _np_quat_mul(q, dq)
    out = np.asarray(m.quat_diff_so3(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(out, w, rtol=1e-4, atol=1e-10)


def test_axis_angle_diff_wraps_to_pi(rng):
    q = np.array([1.0, 0, 0, 0])
    # rotation of 3*pi/2 about z == rotation of -pi/2 => angle pi/2 about -z
    ang = 3 * np.pi / 2
    v = np.array([np.cos(ang / 2), 0, 0, np.sin(ang / 2)])
    angle, axis = m.axis_angle_diff(jnp.asarray(q), jnp.asarray(v))
    np.testing.assert_allclose(float(angle), np.pi / 2, atol=1e-9)
    np.testing.assert_allclose(np.asarray(axis), [0, 0, -1.0], atol=1e-9)


def test_quat_rotate_matches_matrix(rng):
    q = _rand_quats((6,), rng)
    v = rng.standard_normal((6, 3))
    r = np.asarray(m.quat_to_mat(jnp.asarray(q)))
    expected = np.einsum("...ij,...j->...i", r, v)
    np.testing.assert_allclose(np.asarray(m.quat_rotate(jnp.asarray(q), jnp.asarray(v))), expected, atol=1e-12)


def test_quat_integrate_matches_mujoco():
    mujoco = pytest.importorskip("mujoco")
    rng = np.random.default_rng(3)
    q = _rand_quats((1,), rng)[0]
    w = rng.standard_normal(3)
    dt = 0.01
    expected = q.copy()
    mujoco.mju_quatIntegrate(expected, w, dt)
    out = np.asarray(m.quat_integrate(jnp.asarray(q), jnp.asarray(w), dt))
    np.testing.assert_allclose(out, expected, atol=1e-10)


def test_safe_normalize_axis_zero():
    out = np.asarray(m.safe_normalize_axis(jnp.zeros((3,))))
    np.testing.assert_allclose(out, [1.0, 0, 0])
