"""Unit tests for the SE3/Sim3 Lie core (geometry/lie.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_annotate_tpu.geometry import lie


def rand_vec(key, n, scale=1.0):
    return jax.random.normal(key, (n,)) * scale


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 0.5, 2.0, 3.0])
def test_so3_exp_log_roundtrip(scale):
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    for k in keys:
        phi = np.asarray(rand_vec(k, 3, scale))
        if np.linalg.norm(phi) > np.pi * 0.98:
            phi = phi / np.linalg.norm(phi) * np.pi * 0.95
        R = lie.so3_exp(jnp.asarray(phi))
        # orthonormality
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=5e-5)
        assert np.linalg.det(np.asarray(R)) > 0.99
        phi2 = np.asarray(lie.so3_log(R))
        np.testing.assert_allclose(phi2, phi, atol=5e-4 + 1e-3 * scale)


def test_so3_log_near_pi():
    axis = np.array([0.3, -0.5, 0.8])
    axis /= np.linalg.norm(axis)
    phi = axis * (np.pi - 1e-3)
    R = lie.so3_exp(jnp.asarray(phi, jnp.float32))
    phi2 = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(phi2, phi, atol=2e-2)


def test_se3_exp_log_roundtrip():
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    for k in keys:
        xi = np.asarray(rand_vec(k, 6, 0.7))
        R, t = lie.se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(lie.se3_log(R, t))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_se3_compose_inverse():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    Ra, ta = lie.se3_exp(rand_vec(k1, 6, 0.5))
    Rb, tb = lie.se3_exp(rand_vec(k2, 6, 0.5))
    Rc, tc = lie.se3_compose(Ra, ta, Rb, tb)
    x = jnp.array([0.3, -1.2, 2.0])
    y1 = lie.se3_apply(Rc, tc, x)
    y2 = lie.se3_apply(Ra, ta, lie.se3_apply(Rb, tb, x))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

    Ri, ti = lie.se3_inverse(Ra, ta)
    Re, te = lie.se3_compose(Ri, ti, Ra, ta)
    np.testing.assert_allclose(np.asarray(Re), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(te), 0, atol=1e-6)


def test_se3_retract_small_step_linear():
    """Retraction derivative equals identity at xi=0 (first-order check)."""
    R, t = lie.se3_exp(jnp.asarray(np.random.RandomState(3).randn(6) * 0.4, jnp.float32))
    x = jnp.array([0.5, 0.2, 3.0])

    def f(xi):
        R2, t2 = lie.se3_retract(R, t, xi)
        return lie.se3_apply(R2, t2, x)

    J = jax.jacfwd(f)(jnp.zeros(6))
    # analytic: d(exp(xi) T x)/dxi at 0 = [I | -hat(Tx)]
    Tx = lie.se3_apply(R, t, x)
    J_expected = jnp.concatenate([jnp.eye(3), -lie.hat(Tx)], axis=1)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_expected), atol=1e-4)


@pytest.mark.parametrize(
    "sigma,theta_scale",
    [(0.0, 1.0), (1e-6, 1e-7), (0.3, 1.0), (-0.5, 1e-3)],
)
def test_sim3_exp_matches_matrix_exponential(sigma, theta_scale):
    """Golden: the 4x4 matrix exponential of [[sigma*I + hat(phi), rho],
    [0, 0]] equals [[s*R, t], [0, 1]]."""
    from scipy.linalg import expm

    rng = np.random.RandomState(7)
    rho = rng.randn(3).astype(np.float64)
    phi = (rng.randn(3) * theta_scale).astype(np.float64)
    xi = jnp.asarray(np.concatenate([rho, phi, [sigma]]), jnp.float32)
    s, R, t = lie.sim3_exp(xi)

    A = np.zeros((4, 4))
    A[:3, :3] = sigma * np.eye(3) + np.asarray(lie.hat(jnp.asarray(phi, jnp.float32)))
    A[:3, 3] = rho
    M = expm(A)
    np.testing.assert_allclose(float(s) * np.asarray(R), M[:3, :3], atol=5e-5)
    np.testing.assert_allclose(np.asarray(t), M[:3, 3], atol=1e-4, rtol=1e-4)


def test_sim3_log_roundtrip():
    rng = np.random.RandomState(11)
    xi = jnp.asarray(
        np.concatenate([rng.randn(3), rng.randn(3) * 0.5, [0.3]]), jnp.float32
    )
    s, R, t = lie.sim3_exp(xi)
    xi2 = lie.sim3_log(s, R, t)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_sim3_apply_inverse():
    xi = jnp.asarray([0.1, -0.2, 0.3, 0.2, 0.1, -0.3, 0.4], jnp.float32)
    s, R, t = lie.sim3_exp(xi)
    si, Ri, ti = lie.sim3_inverse(s, R, t)
    x = jnp.array([1.0, 2.0, -0.5])
    y = lie.sim3_apply(s, R, t, x)
    x2 = lie.sim3_apply(si, Ri, ti, y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)


def test_quaternion_roundtrip():
    keys = jax.random.split(jax.random.PRNGKey(5), 8)
    for k in keys:
        phi = rand_vec(k, 3, 2.0)
        R = lie.so3_exp(phi)
        q = lie.rot_to_quat(R)
        R2 = lie.quat_to_rot(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
        np.testing.assert_allclose(float(jnp.linalg.norm(q)), 1.0, atol=1e-6)


def test_batched_via_vmap():
    xis = jax.random.normal(jax.random.PRNGKey(9), (32, 6)) * 0.5
    Rs, ts = jax.vmap(lie.se3_exp)(xis)
    assert Rs.shape == (32, 3, 3) and ts.shape == (32, 3)
    xi2 = jax.vmap(lie.se3_log)(Rs, ts)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xis), atol=1e-4)


def test_so3_log_roundtrip_theta_sweep_and_jacfwd_finite():
    """Pin so3_log(so3_exp(phi)) across theta in [1e-6, pi) including the
    near-pi band, and require jacfwd of the pose-graph-style composed
    residual log(R0^T exp(dphi) R0) at dphi=0 to be finite AND match
    central differences (the round-1 regression left the pose graph with
    a silently-inert NaN linearization)."""
    axes = [
        np.array([0.3, -0.5, 0.8]),
        np.array([1.0, 0.0, 0.0]),       # coordinate axis (near-pi sqrt edge)
        np.array([0.0, 0.0, 1.0]),
    ]
    thetas = [1e-6, 1e-4, 1e-3, 1e-2, 0.1, 0.5, 1.0, 2.0, 3.0, 3.1, 3.1406]

    def res(dphi, R0):
        return lie.so3_log(R0.T @ (lie.so3_exp(dphi) @ R0))

    roundtrip = jax.jit(lambda phi: lie.so3_log(lie.so3_exp(phi)))
    jac = jax.jit(jax.jacfwd(res, argnums=0))
    res_j = jax.jit(res)

    for ax in axes:
        ax = ax / np.linalg.norm(ax)
        for th in thetas:
            phi = jnp.asarray(th * ax, dtype=jnp.float32)
            back = roundtrip(phi)
            tol = 2e-3 if th > 3.1 else 5e-5 if th > 2.5 else 1e-5
            np.testing.assert_allclose(
                np.asarray(back), np.asarray(phi), atol=tol,
                err_msg=f"roundtrip theta={th} axis={ax}")

            R = lie.so3_exp(phi)
            J = jac(jnp.zeros(3, jnp.float32), R)
            assert bool(jnp.all(jnp.isfinite(J))), f"jacfwd NaN at theta={th} axis={ax}"
            if th < 3.0:  # FD itself is ill-conditioned in the near-pi band
                eps = 1e-3
                for i in range(3):
                    e = np.zeros(3, np.float32)
                    e[i] = eps
                    fd = (np.asarray(res_j(jnp.asarray(e), R))
                          - np.asarray(res_j(jnp.asarray(-e), R))) / (2 * eps)
                    np.testing.assert_allclose(
                        np.asarray(J[:, i]), fd, atol=5e-3,
                        err_msg=f"jacfwd mismatch theta={th} axis={ax} col={i}")
