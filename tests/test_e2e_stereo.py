"""Stereo end-to-end: rectified L/R pairs drive track_stereo over a full
sequence with METRIC-scale trajectory recovery (VERDICT r2 item 5;
reference stereo drivers: Examples/Stereo/stereo_kitti.cc, Frame.cc:61).

The right image is the scene rendered from a camera displaced by the
baseline along the left camera's +x axis (rectified geometry:
t_R = t_L - [b, 0, 0] in camera coordinates), so stereo matching sees
true disparity with exact ground truth.
"""

import numpy as np
import pytest

from orb_slam2_annotate_tpu.geometry import CameraModel
from orb_slam2_annotate_tpu.io import evaluation, synthetic
from orb_slam2_annotate_tpu.pipeline import SlamConfig, System

BASELINE = 0.3  # disparity ~8-15 px at the scene depth (KITTI-like ratio)
CAM = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                         bf=250.0 * BASELINE, width=320, height=240)


def _render_pair(scene, R, t):
    img_l, _ = scene.render(CAM, R, t, h=240, w=320)
    t_r = np.asarray(t, np.float32) - np.array([BASELINE, 0, 0], np.float32)
    img_r, _ = scene.render(CAM, R, t_r, h=240, w=320)
    u8 = lambda im: np.clip(im, 0, 255).astype(np.uint8)
    return u8(img_l), u8(img_r)


@pytest.mark.slow
def test_e2e_stereo_metric_trajectory():
    n_frames = 24
    scene = synthetic.PlaneScene(seed=5)
    poses = synthetic.orbit_trajectory(n_frames, step=0.05)

    cfg = SlamConfig(sensor="stereo", n_features=512, n_levels=4,
                     max_kf=64, max_mp=8192, max_frames_between_kf=6,
                     th_depth=100.0, enable_loop_closing=False)
    slam = System(CAM, cfg)

    live = {}
    for k, (R, t) in enumerate(poses):
        img_l, img_r = _render_pair(scene, R, t)
        T = slam.track_stereo(img_l, img_r, k / 30.0)
        if T is not None:
            live[k] = np.asarray(T)
    slam.flush()

    assert len(live) > 0.8 * n_frames, f"tracked {len(live)}/{n_frames}"
    assert slam.n_keyframes >= 2
    assert slam.n_mappoints > 200

    est = np.stack([-T[:3, :3].T @ T[:3, 3] for T in live.values()])
    gt = np.stack([-poses[k][0].T @ poses[k][1] for k in live])
    # METRIC: no Sim3/scale alignment — stereo fixes absolute scale
    # (the whole point of the stereo path, Tracking.cc:549)
    rmse, _ = evaluation.ate_rmse(est, gt, with_scale=False)
    assert rmse < 0.12, f"stereo metric ATE {rmse:.3f} m"

    # scale correctness specifically: total path length within 10% of GT
    def path(c):
        return float(np.sum(np.linalg.norm(np.diff(c, axis=0), axis=1)))
    assert abs(path(est) - path(gt)) < 0.15 * max(path(gt), 1e-6), \
        f"stereo scale drift: est path {path(est):.3f} vs gt {path(gt):.3f}"
