"""Unit tests for SE(3)/SO(3) ops (reference: auxiliar.cpp helpers)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plslam_tpu.core import lie


def rand_twists(key, n, scale_v=1.0, scale_w=1.0):
    kv, kw = jax.random.split(key)
    v = jax.random.normal(kv, (n, 3)) * scale_v
    w = jax.random.normal(kw, (n, 3)) * scale_w
    return jnp.concatenate([v, w], axis=-1)


def test_exp_log_roundtrip():
    xi = rand_twists(jax.random.PRNGKey(0), 64, scale_w=0.8)
    T = lie.exp_se3(xi)
    xi2 = lie.log_se3(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_exp_small_angle_stable():
    xi = jnp.array([[1e-9, 2e-9, -1e-9, 1e-10, -1e-10, 1e-10],
                    [0.0] * 6])
    T = lie.exp_se3(xi)
    assert np.all(np.isfinite(np.asarray(T)))
    np.testing.assert_allclose(np.asarray(T[1]), np.eye(4), atol=1e-7)
    # gradient must also be finite through the small-angle branch
    g = jax.grad(lambda x: jnp.sum(lie.exp_se3(x)))(xi)
    assert np.all(np.isfinite(np.asarray(g)))


def test_rotation_validity():
    xi = rand_twists(jax.random.PRNGKey(1), 32, scale_w=2.0)
    T = lie.exp_se3(xi)
    assert bool(jnp.all(lie.is_valid_rotation(T[:, :3, :3])))


def test_inverse():
    xi = rand_twists(jax.random.PRNGKey(2), 16)
    T = lie.exp_se3(xi)
    I = T @ lie.inverse_se3(T)
    np.testing.assert_allclose(np.asarray(I), np.tile(np.eye(4), (16, 1, 1)),
                               atol=1e-5)


def test_log_near_pi():
    axis = np.array([0.3, -0.5, 0.81])
    axis = axis / np.linalg.norm(axis)
    for ang in [np.pi - 1e-6, np.pi - 1e-3, 3.0]:
        w = jnp.asarray((ang * axis)[None], dtype=jnp.float32)
        R = lie.exp_so3(w)
        w2 = lie.log_so3(R)
        R2 = lie.exp_so3(w2)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_transform_points_matches_matmul():
    xi = rand_twists(jax.random.PRNGKey(3), 1)[0]
    T = lie.exp_se3(xi)
    P = jax.random.normal(jax.random.PRNGKey(4), (10, 3))
    Ph = jnp.concatenate([P, jnp.ones((10, 1))], axis=-1)
    expect = (Ph @ np.asarray(T).T)[:, :3]
    got = lie.transform_points(T, P)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


def test_adjoint_identity():
    """Adj(T) xi == log(T exp(xi) T^-1) for small xi."""
    xi0 = rand_twists(jax.random.PRNGKey(5), 1)[0] * 0.5
    T = lie.exp_se3(xi0)
    xi = rand_twists(jax.random.PRNGKey(6), 1)[0] * 1e-3
    lhs = lie.adjoint_se3(T) @ xi
    rhs = lie.log_se3(T @ lie.exp_se3(xi) @ lie.inverse_se3(T))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_jit_and_vmap():
    f = jax.jit(jax.vmap(lambda x: lie.log_se3(lie.exp_se3(x))))
    xi = rand_twists(jax.random.PRNGKey(7), 8)
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-4)
