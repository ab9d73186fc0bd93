"""Stereo rectification: undistort-rectify maps + device-side remap.

The reference's EuRoC stereo driver rectifies both images on the host with
cv::initUndistortRectifyMap + cv::remap built from the YAML LEFT./RIGHT.
K, D, R, P matrices (reference Examples/Stereo/stereo_euroc.cc:62-90 and
Examples/Stereo/EuRoC.yaml).  Here the map is computed once as a dense
[H, W, 2] source-coordinate grid and the per-frame warp is a jitted
bilinear gather, so both images of a stereo pair rectify in one fused
device program instead of two host-side cv::remap calls.

Also provides a Bouguet-style stereo_rectify() that derives the
rectifying rotations/projections from relative extrinsics for datasets
that do not ship precomputed R/P matrices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .camera import CameraModel, distort_normalized
from . import lie


def rectify_map(K: np.ndarray, dist: np.ndarray, R: np.ndarray,
                P: np.ndarray, height: int, width: int) -> jnp.ndarray:
    """Source-pixel lookup map for the rectified image, [H, W, 2] (x, y).

    cv::initUndistortRectifyMap semantics: for each rectified pixel p,
    back-project through the new projection P, rotate by R^-1 into the
    original camera frame, apply the distortion model, and project with
    the original K.

    K: [3,3] original intrinsics; dist: [5] (k1,k2,p1,p2,k3);
    R: [3,3] rectifying rotation; P: [3,3] or [3,4] new projection.
    """
    K = np.asarray(K, np.float32)
    dist = np.pad(np.asarray(dist, np.float32).ravel(), (0, 5))[:5]
    R = np.asarray(R, np.float32)
    P = np.asarray(P, np.float32)[:3, :3]

    u, v = np.meshgrid(np.arange(width, dtype=np.float32),
                       np.arange(height, dtype=np.float32))
    ones = np.ones_like(u)
    pix = np.stack([u, v, ones], -1).reshape(-1, 3)          # [HW,3]
    rays = pix @ np.linalg.inv(P).T @ np.linalg.inv(R).T      # [HW,3]
    xn = rays[:, :2] / np.maximum(rays[:, 2:3], 1e-9)

    cam = CameraModel.create(
        fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
        k1=dist[0], k2=dist[1], p1=dist[2], p2=dist[3], k3=dist[4],
        width=width, height=height,
    )
    xd = np.asarray(distort_normalized(cam, jnp.asarray(xn)))
    src = np.stack([
        K[0, 0] * xd[:, 0] + K[0, 2],
        K[1, 1] * xd[:, 1] + K[1, 2],
    ], -1).reshape(height, width, 2)
    return jnp.asarray(src, jnp.float32)


@jax.jit
def remap_bilinear(img: jnp.ndarray, map_xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp: img [H, W] sampled at map_xy [Ho, Wo, 2] (x, y).

    Out-of-range samples produce 0 (cv::remap BORDER_CONSTANT).
    """
    H, W = img.shape
    x = map_xy[..., 0]
    y = map_xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def at(yy, xx):
        inb = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        flat = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)
        return jnp.where(inb, jnp.take(img.reshape(-1), flat), 0.0)

    v00 = at(y0i, x0i)
    v01 = at(y0i, x0i + 1)
    v10 = at(y0i + 1, x0i)
    v11 = at(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


@jax.jit
def remap_pair(img_l, img_r, map_l, map_r):
    """Rectify a stereo pair in one dispatch (the reference remaps L and R
    sequentially on host, stereo_euroc.cc:157-158)."""
    return remap_bilinear(img_l, map_l), remap_bilinear(img_r, map_r)


def stereo_rectify(K1, D1, K2, D2, R, t, height: int, width: int):
    """Bouguet rectification from relative extrinsics (x2 = R x1 + t).

    Returns (R1, R2, P1, P2, bf): per-camera rectifying rotations, the
    shared new projection (P2 carries the baseline term), and bf = fx * b
    for CameraModel.  Equivalent role to cv::stereoRectify(alpha=0) minus
    the optimal-crop search: the new principal point is the mean of the
    two originals and the new focal the mean fy (adequate for the
    EuRoC-class inputs the reference targets).
    """
    K1 = np.asarray(K1, np.float64)
    K2 = np.asarray(K2, np.float64)
    R = np.asarray(R, np.float64)
    t = np.asarray(t, np.float64).ravel()

    # split the relative rotation evenly between the two cameras
    om = np.asarray(lie.so3_log(jnp.asarray(R, jnp.float32)), np.float64)
    r_half = np.asarray(lie.so3_exp(jnp.asarray(-om / 2, jnp.float32)),
                        np.float64)
    t_half = r_half @ t

    # align the new x-axis with the baseline
    e1 = t_half / np.linalg.norm(t_half)
    if e1[0] < 0:          # keep +x to the right so disparity is positive
        e1 = -e1
    e2 = np.cross([0.0, 0.0, 1.0], e1)
    e2 /= np.linalg.norm(e2)
    e3 = np.cross(e1, e2)
    R_rect = np.stack([e1, e2, e3])

    R2 = R_rect @ r_half
    R1 = R2 @ R           # so that R2 @ R @ R1^T = I

    f = 0.5 * (K1[1, 1] + K2[1, 1])
    cx = 0.5 * (K1[0, 2] + K2[0, 2])
    cy = 0.5 * (K1[1, 2] + K2[1, 2])
    Knew = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float32)
    baseline = np.linalg.norm(t)
    P1 = np.concatenate([Knew, np.zeros((3, 1), np.float32)], 1)
    P2 = P1.copy()
    P2[0, 3] = -f * baseline   # left camera at origin, right offset along -x
    bf = float(f * baseline)
    return (R1.astype(np.float32), R2.astype(np.float32), P1, P2, bf)


class StereoRectifier:
    """Precomputed maps + jitted pair remap (driver-facing wrapper)."""

    def __init__(self, K_l, D_l, R_l, P_l, K_r, D_r, R_r, P_r,
                 height: int, width: int):
        self.map_l = rectify_map(K_l, D_l, R_l, P_l, height, width)
        self.map_r = rectify_map(K_r, D_r, R_r, P_r, height, width)
        P_l = np.asarray(P_l, np.float32)
        self.cam = CameraModel.create(
            fx=P_l[0, 0], fy=P_l[1, 1], cx=P_l[0, 2], cy=P_l[1, 2],
            width=width, height=height,
        )

    def __call__(self, img_l, img_r):
        return remap_pair(jnp.asarray(img_l, jnp.float32),
                          jnp.asarray(img_r, jnp.float32),
                          self.map_l, self.map_r)
