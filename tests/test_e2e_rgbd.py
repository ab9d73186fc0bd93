"""End-to-end RGB-D SLAM on the synthetic plane scene (exact depth)."""

import numpy as np
import pytest

from orb_slam2_annotate_tpu.geometry import CameraModel
from orb_slam2_annotate_tpu.io import evaluation, synthetic
from orb_slam2_annotate_tpu.pipeline import SlamConfig, System

CAM = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                         bf=250.0 * 0.08, width=320, height=240)


@pytest.mark.slow
def test_rgbd_synthetic_sequence():
    n_frames = 30
    scene = synthetic.PlaneScene(seed=2)
    poses = synthetic.orbit_trajectory(n_frames, step=0.06)

    cfg = SlamConfig(
        sensor="rgbd", n_features=512, n_levels=4, max_kf=64, max_mp=8192,
        max_frames_between_kf=8, th_depth=100.0,
    )
    slam = System(CAM, cfg)

    for k, (R, t) in enumerate(poses):
        img, dep = scene.render(CAM, R, t, h=240, w=320)
        slam.track_rgbd(img, dep, k / 30.0)

    assert slam.state == "OK", slam.state
    assert slam.n_keyframes >= 3
    traj = dict(slam.frame_trajectory())
    ids = [k for k, T in traj.items() if T is not None]
    assert len(ids) > 0.8 * n_frames, f"tracked {len(ids)}/{n_frames}"

    est_c = np.stack([-traj[k][:3, :3].T @ traj[k][:3, 3] for k in ids])
    gt_c = np.stack([-poses[k][0].T @ poses[k][1] for k in ids])
    # depth gives metric scale: align SE3 only (no scale)
    rmse, _ = evaluation.ate_rmse(est_c, gt_c, with_scale=False)
    err = np.linalg.norm(est_c - gt_c, axis=1)
    # a short transient excursion recovers (relocalization-like catch);
    # median must be tight, RMSE bounded.  TODO(drift): shrink transient.
    assert float(np.median(err)) < 0.05, f"median err {np.median(err):.3f} m"
    assert rmse < 0.10, f"RGB-D ATE RMSE {rmse:.3f} m"
    # scale must be metric (depth-seeded): end-to-end displacement ratio
    d_est = np.linalg.norm(est_c[-1] - est_c[0])
    d_gt = np.linalg.norm(gt_c[-1] - gt_c[0])
    assert abs(d_est / d_gt - 1.0) < 0.05, (d_est, d_gt)
