"""Trajectory export in TUM and KITTI formats.

Reference: System::SaveTrajectoryTUM / SaveKeyFrameTrajectoryTUM /
SaveTrajectoryKITTI (System.cc:327-477).  Both emit camera-to-world
(Twc) like the reference.
"""

from __future__ import annotations

import numpy as np

from ..geometry import lie
import jax.numpy as jnp


def _invert(T: np.ndarray) -> np.ndarray:
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = np.eye(4, dtype=T.dtype)
    Ti[:3, :3] = R.T
    Ti[:3, 3] = -R.T @ t
    return Ti


def save_tum(path: str, stamped_poses):
    """stamped_poses: iterable of (timestamp, 4x4 Tcw).  Writes
    `timestamp tx ty tz qx qy qz qw` of Twc per line (System.h:97-113)."""
    with open(path, "w") as f:
        for ts, Tcw in stamped_poses:
            if Tcw is None:
                continue
            Twc = _invert(np.asarray(Tcw))
            q = np.asarray(lie.rot_to_quat(jnp.asarray(Twc[:3, :3])))
            t = Twc[:3, 3]
            f.write(
                f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
            )


def save_kitti(path: str, poses):
    """poses: iterable of 4x4 Tcw.  Writes 3x4 Twc row-major per line."""
    with open(path, "w") as f:
        for Tcw in poses:
            if Tcw is None:
                continue
            Twc = _invert(np.asarray(Tcw))
            r = Twc[:3, :4].reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in r) + "\n")


def load_tum(path: str):
    """Returns (timestamps [N], positions [N,3], quaternions [N,4])."""
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None]
    return data[:, 0], data[:, 1:4], data[:, 4:8]
