"""Tests for camera model and two-view geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_annotate_tpu.geometry import CameraModel, camera, lie, twoview

CAM = CameraModel.create(
    fx=517.3, fy=516.5, cx=318.6, cy=255.3,
    k1=0.2624, k2=-0.9531, p1=-0.0054, p2=0.0026, k3=1.1633,
    bf=40.0, width=640, height=480,
)


def test_undistort_roundtrip():
    rng = np.random.RandomState(0)
    xn = jnp.asarray(rng.uniform(-0.4, 0.4, (100, 2)), jnp.float32)
    xd = camera.distort_normalized(CAM, xn)
    xn2 = camera.undistort_normalized(CAM, xd, iters=12)
    np.testing.assert_allclose(np.asarray(xn2), np.asarray(xn), atol=1e-4)


def test_undistort_matches_opencv():
    import cv2

    rng = np.random.RandomState(1)
    uv = rng.uniform([120, 100], [520, 380], (50, 2)).astype(np.float32)
    K = np.asarray(CAM.K)
    dist = np.array([CAM.k1, CAM.k2, CAM.p1, CAM.p2, CAM.k3], np.float64)
    ref = cv2.undistortPoints(uv.reshape(-1, 1, 2), K, dist, P=K).reshape(-1, 2)
    ours = np.asarray(camera.undistort_pixels(CAM, jnp.asarray(uv)))
    np.testing.assert_allclose(ours, ref, atol=0.05)


def test_project_backproject():
    rng = np.random.RandomState(2)
    depth = jnp.asarray(rng.uniform(0.5, 5.0, (64,)), jnp.float32)
    uv = jnp.asarray(rng.uniform([50, 50], [600, 430], (64, 2)), jnp.float32)
    X = camera.backproject(CAM, uv, depth)
    uv2 = camera.project(CAM, X)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)
    uvr = camera.project_stereo(CAM, X)
    np.testing.assert_allclose(
        np.asarray(uvr[:, 2]), np.asarray(uv[:, 0] - CAM.bf / depth), atol=1e-3
    )


def _synthetic_two_view(n=120, seed=0, noise=0.0):
    """Random 3D points seen by two cameras with known relative pose."""
    rng = np.random.RandomState(seed)
    X = rng.uniform([-2, -1.5, 4], [2, 1.5, 9], (n, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.1, 0.03], jnp.float32)))
    t = np.array([0.3, 0.02, 0.05], np.float32)
    K = np.asarray(CAM.K)

    def proj(Xc):
        p = Xc @ K.T
        return p[:, :2] / p[:, 2:3]

    x1 = proj(X) + rng.randn(n, 2) * noise
    x2 = proj(X @ R.T + t) + rng.randn(n, 2) * noise
    return X, R, t, x1.astype(np.float32), x2.astype(np.float32)


def test_triangulate_dlt():
    X, R, t, x1, x2 = _synthetic_two_view()
    K = np.asarray(CAM.K)
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R, t[:, None]])
    Xh = twoview.triangulate_dlt_batch(
        jnp.asarray(P1, jnp.float32), jnp.asarray(P2, jnp.float32),
        jnp.asarray(x1), jnp.asarray(x2),
    )
    np.testing.assert_allclose(np.asarray(Xh), X, atol=2e-2)


def test_fundamental_8pt_epipolar_residual():
    X, R, t, x1, x2 = _synthetic_two_view(n=8, seed=3)
    F = twoview.fit_fundamental_8pt(jnp.asarray(x1), jnp.asarray(x2))
    c1, c2 = twoview.fundamental_symmetric_chi2(F, jnp.asarray(x1), jnp.asarray(x2), 1.0)
    # f32 eigh of A^T A: residual well below the 3.84 RANSAC gate
    assert float(jnp.max(c1 + c2)) < 0.1


def test_fundamental_vs_ground_truth_on_inliers():
    X, R, t, x1, x2 = _synthetic_two_view(n=8, seed=4)
    F = twoview.fit_fundamental_8pt(jnp.asarray(x1), jnp.asarray(x2))
    # check other points from the same geometry lie on epipolar lines
    _, _, _, y1, y2 = _synthetic_two_view(n=100, seed=5)
    c1, c2 = twoview.fundamental_symmetric_chi2(F, jnp.asarray(y1), jnp.asarray(y2), 1.0)
    assert float(jnp.median(c1 + c2)) < 0.5


def test_homography_dlt_planar():
    rng = np.random.RandomState(6)
    # planar scene: z = 5 plane
    Xp = rng.uniform([-2, -1.5], [2, 1.5], (30, 2)).astype(np.float32)
    X = np.concatenate([Xp, np.full((30, 1), 5.0, np.float32)], axis=1)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.04, 0.02], jnp.float32)))
    t = np.array([0.2, -0.1, 0.1], np.float32)
    K = np.asarray(CAM.K)
    p1 = X @ K.T
    x1 = (p1[:, :2] / p1[:, 2:3]).astype(np.float32)
    p2 = (X @ R.T + t) @ K.T
    x2 = (p2[:, :2] / p2[:, 2:3]).astype(np.float32)
    H = twoview.fit_homography_dlt(jnp.asarray(x1), jnp.asarray(x2))
    c1, c2 = twoview.homography_symmetric_chi2(H, jnp.asarray(x1), jnp.asarray(x2), 1.0)
    assert float(jnp.max(c1 + c2)) < 1e-2


def test_decompose_essential_recovers_pose():
    X, R, t, x1, x2 = _synthetic_two_view(n=60, seed=7)
    K = jnp.asarray(np.asarray(CAM.K), jnp.float32)
    F = twoview.fit_fundamental_8pt(jnp.asarray(x1[:8]), jnp.asarray(x2[:8]))
    E = K.T @ F @ K
    Rs, ts = twoview.decompose_essential(E)
    mask = jnp.ones(x1.shape[0], bool)
    best_n, best_i = -1, -1
    for i in range(4):
        n, good, _, _ = twoview.check_rt(
            Rs[i], ts[i], jnp.asarray(x1), jnp.asarray(x2), mask, K, K, 1.0
        )
        if int(n) > best_n:
            best_n, best_i = int(n), i
    assert best_n > 50
    R_est = np.asarray(Rs[best_i])
    t_est = np.asarray(ts[best_i])
    np.testing.assert_allclose(R_est, R, atol=1e-2)
    t_dir = t / np.linalg.norm(t)
    np.testing.assert_allclose(t_est, t_dir, atol=2e-2)
