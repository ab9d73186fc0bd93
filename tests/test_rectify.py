"""Stereo rectification: map construction, bilinear remap, Bouguet split.

Reference semantics: cv::initUndistortRectifyMap + cv::remap as used by
the EuRoC stereo driver (Examples/Stereo/stereo_euroc.cc:62-90).
"""

import numpy as np
import jax.numpy as jnp

from orb_slam2_annotate_tpu.geometry import lie
from orb_slam2_annotate_tpu.geometry.camera import CameraModel, distort_normalized
from orb_slam2_annotate_tpu.geometry.rectify import (
    StereoRectifier, rectify_map, remap_bilinear, stereo_rectify,
)

K = np.array([[458.0, 0, 367.0], [0, 457.0, 248.0], [0, 0, 1]], np.float32)
H, W = 96, 128


def test_identity_map():
    m = rectify_map(K, np.zeros(5), np.eye(3), K, H, W)
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(m[..., 0]), u, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m[..., 1]), v, atol=1e-3)


def test_map_matches_distortion_model():
    """Each rectified pixel must look up the distorted location of its own
    ideal ray (that is the definition of the undistort map)."""
    dist = np.array([-0.28, 0.07, 1e-4, -2e-5, 0.0], np.float32)
    m = np.asarray(rectify_map(K, dist, np.eye(3), K, H, W))
    cam = CameraModel.create(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                             k1=dist[0], k2=dist[1], p1=dist[2], p2=dist[3],
                             width=W, height=H)
    u, v = 100.0, 50.0
    xn = np.array([(u - K[0, 2]) / K[0, 0], (v - K[1, 2]) / K[1, 1]])
    xd = np.asarray(distort_normalized(cam, jnp.asarray(xn)))
    exp = [K[0, 0] * xd[0] + K[0, 2], K[1, 1] * xd[1] + K[1, 2]]
    np.testing.assert_allclose(m[50, 100], exp, atol=1e-3)


def test_remap_bilinear_translation():
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    # shift by (+3, +2): output(y, x) = img(y + 2, x + 3)
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    m = jnp.asarray(np.stack([u + 3, v + 2], -1))
    out = np.asarray(remap_bilinear(jnp.asarray(img), m))
    np.testing.assert_allclose(out[:-2, :-3], img[2:, 3:], atol=1e-4)
    assert np.all(out[-2:] == 0) and np.all(out[:, -3:] == 0)  # border


def test_stereo_rectify_aligns_baseline():
    # ground-truth rig: right camera 11 cm along x, small rotation
    om = np.array([0.02, -0.03, 0.01], np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(om)))
    t = np.array([-0.11, 0.004, -0.002], np.float32)  # x2 = R x1 + t
    R1, R2, P1, P2, bf = stereo_rectify(K, np.zeros(5), K, np.zeros(5),
                                        R, t, H, W)
    # rectified frames share orientation
    np.testing.assert_allclose(R2 @ R @ R1.T, np.eye(3), atol=1e-5)
    # baseline purely along x in the rectified frame
    tr = R2 @ t
    assert abs(tr[1]) < 1e-6 and abs(tr[2]) < 1e-6
    assert bf > 0 and abs(bf - P1[0, 0] * np.linalg.norm(t)) < 1e-3


def test_rectifier_end_to_end_epipolar():
    """Rows of a rectified stereo pair must correspond: a 3D point projects
    to the same v in both rectified images."""
    om = np.array([0.01, -0.02, 0.005], np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(om)))
    t = np.array([-0.11, 0.003, -0.001], np.float32)
    dist = np.array([-0.28, 0.07, 0.0, 0.0, 0.0], np.float32)
    R1, R2, P1, P2, bf = stereo_rectify(K, dist, K, dist, R, t, H, W)
    rng = np.random.RandomState(1)
    X = rng.uniform([-0.5, -0.5, 2.0], [0.5, 0.5, 4.0], (64, 3))

    def project_rect(Rr, Xc):
        xc = Xc @ Rr.T
        return (P1[:3, :3] @ (xc / xc[:, 2:]).T).T[:, :2]

    Xl = X                       # cam1 frame
    Xr = X @ R.T + t             # cam2 frame
    uvl = project_rect(R1, Xl)
    uvr = project_rect(R2, Xr)
    # same scanline; positive disparity
    assert np.max(np.abs(uvl[:, 1] - uvr[:, 1])) < 1e-3
    disp = uvl[:, 0] - uvr[:, 0]
    assert np.all(disp > 0)
    # disparity = bf / depth in the rectified left frame
    zl = (Xl @ R1.T)[:, 2]
    np.testing.assert_allclose(disp, bf / zl, rtol=1e-4)

    rect = StereoRectifier(K, dist, R1, P1, K, dist, R2, P2, H, W)
    il, ir = rect(np.ones((H, W), np.float32), np.ones((H, W), np.float32))
    assert il.shape == (H, W) and ir.shape == (H, W)
    assert float(rect.cam.fx) == P1[0, 0]
