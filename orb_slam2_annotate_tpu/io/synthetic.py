"""Synthetic sequence renderer with exact ground truth.

No SLAM datasets ship with the repo (the reference's TUM/KITTI/EuRoC
fixtures are external downloads, README.md:101-173), so unit/integration
tests and benchmarks render their own scenes: a cloud of Gaussian blobs
at varied depths observed by a moving camera.  Blob centers project
exactly through the ground-truth poses, giving FAST corners and BRIEF
texture with a perfectly known trajectory; depth maps are also exact,
which exercises the RGB-D path.
"""

from __future__ import annotations

import numpy as np

from ..geometry.camera import CameraModel


class BlobScene:
    def __init__(self, n_blobs: int = 1500, seed: int = 0,
                 extent=((-4.0, 4.0), (-3.0, 3.0), (4.0, 12.0))):
        rng = np.random.RandomState(seed)
        lo = np.array([e[0] for e in extent])
        hi = np.array([e[1] for e in extent])
        self.pts = rng.uniform(lo, hi, (n_blobs, 3)).astype(np.float32)
        self.amp = rng.uniform(60, 200, n_blobs).astype(np.float32)
        self.sign = np.where(rng.rand(n_blobs) > 0.3, 1.0, -1.0).astype(np.float32)
        # mostly sharp dots (1-3 px at typical depth) + a few broad patches;
        # sharp structure is what gives FAST corners and descriptor entropy
        sharp = rng.uniform(0.06, 0.30, n_blobs)
        broad = rng.uniform(1.0, 2.5, n_blobs)
        self.size = np.where(rng.rand(n_blobs) < 0.9, sharp, broad).astype(np.float32)

    def render(self, cam: CameraModel, R: np.ndarray, t: np.ndarray,
               h: int = 480, w: int = 640, background: float = 90.0):
        """Render (image [h,w] f32, depth [h,w] f32) at pose Tcw = (R, t)."""
        fx, fy = float(cam.fx), float(cam.fy)
        cx, cy = float(cam.cx), float(cam.cy)
        xc = self.pts @ R.T + t
        z = xc[:, 2]
        vis = z > 0.5
        u = fx * xc[:, 0] / np.maximum(z, 1e-6) + cx
        v = fy * xc[:, 1] / np.maximum(z, 1e-6) + cy
        sigma_px = self.size * fx / np.maximum(z, 1e-6) / 8.0

        img = np.full((h, w), background, np.float32)
        # mild gradient so the background is not flat
        img += np.linspace(0, 15, w, dtype=np.float32)[None, :]
        img += np.linspace(0, 10, h, dtype=np.float32)[:, None]
        depth = np.full((h, w), 0.0, np.float32)

        order = np.argsort(-z)  # far to near so near blobs overwrite depth
        for i in order:
            if not vis[i]:
                continue
            s = max(float(sigma_px[i]), 0.8)
            rad = int(3 * s + 1)
            ui, vi = int(round(u[i])), int(round(v[i]))
            if ui < -rad or ui >= w + rad or vi < -rad or vi >= h + rad:
                continue
            x0, x1 = max(ui - rad, 0), min(ui + rad + 1, w)
            y0, y1 = max(vi - rad, 0), min(vi + rad + 1, h)
            if x0 >= x1 or y0 >= y1:
                continue
            xs = np.arange(x0, x1, dtype=np.float32) - u[i]
            ys = np.arange(y0, y1, dtype=np.float32) - v[i]
            g = np.exp(-(ys[:, None] ** 2 + xs[None, :] ** 2) / (2 * s * s))
            img[y0:y1, x0:x1] += self.sign[i] * self.amp[i] * g
            m = g > 0.3
            depth[y0:y1, x0:x1][m] = z[i]
        return np.clip(img, 0, 255), depth


def orbit_trajectory(n_frames: int, radius: float = 0.0, step: float = 0.05,
                     yaw_rate: float = 0.004):
    """Sideways translation with slow yaw: list of ground-truth Tcw (R, t).

    Pose k looks down +z from position x = k*step (world), i.e. classic
    lateral sweep giving good triangulation parallax.
    """
    poses = []
    for k in range(n_frames):
        yaw = yaw_rate * k
        Rwc = np.array(
            [
                [np.cos(yaw), 0, np.sin(yaw)],
                [0, 1, 0],
                [-np.sin(yaw), 0, np.cos(yaw)],
            ],
            np.float32,
        )
        cw = np.array([k * step, 0.015 * np.sin(k * 0.2), 0.01 * k], np.float32)
        R = Rwc.T
        t = -R @ cw
        poses.append((R, t))
    return poses
