"""Loop-closing integration: out-and-back sequence must trigger a loop
closure (or at least relocalization-grade repeatability) and the final
pose error must stay bounded."""

import numpy as np
import pytest

from orb_slam2_annotate_tpu.geometry import CameraModel
from orb_slam2_annotate_tpu.io import evaluation, synthetic
from orb_slam2_annotate_tpu.pipeline import SlamConfig, System

CAM = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                         width=320, height=240)


@pytest.mark.slow
def test_out_and_back_loop():
    n_frames = 56
    scene = synthetic.PlaneScene(seed=4)
    poses = synthetic.loop_trajectory(n_frames, extent=1.6, step=0.06)

    cfg = SlamConfig(
        n_features=512, n_levels=4, max_kf=64, max_mp=8192,
        max_frames_between_kf=8, init_min_matches=60,
        enable_loop_closing=True,
    )
    slam = System(CAM, cfg)

    live = {}
    for k, (R, t) in enumerate(poses):
        img, _ = scene.render(CAM, R, t, h=240, w=320)
        T = slam.track_mono(img, k / 30.0)
        if T is not None:
            live[k] = T

    ids = sorted(live)
    assert len(ids) > 0.6 * n_frames, f"tracked {len(ids)}/{n_frames}"

    est_c = np.stack([-live[k][:3, :3].T @ live[k][:3, 3] for k in ids])
    gt_c = np.stack([-poses[k][0].T @ poses[k][1] for k in ids])
    rmse, _ = evaluation.ate_rmse(est_c, gt_c, with_scale=True)
    # out-and-back with revisit: either the loop closes or drift stays
    # low (measured ~0.013 with damped-velocity tracking)
    assert rmse < 0.08, f"loop sequence ATE {rmse:.3f} m"
