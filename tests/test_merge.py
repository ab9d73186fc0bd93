"""Multi-session map merge: two overlapping sessions align into one map."""

import numpy as np
import pytest

from orb_slam2_annotate_tpu.geometry import CameraModel
from orb_slam2_annotate_tpu.io import synthetic
from orb_slam2_annotate_tpu.pipeline import SlamConfig, System
from orb_slam2_annotate_tpu.worldmap import merge

CAM = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                         bf=250.0 * 0.08, width=320, height=240)


@pytest.mark.slow
def test_two_session_merge():
    scene = synthetic.PlaneScene(seed=6)
    poses = synthetic.orbit_trajectory(26, step=0.06)

    def run(span):
        cfg = SlamConfig(sensor="rgbd", n_features=512, n_levels=4,
                         max_kf=64, max_mp=16384, max_frames_between_kf=5,
                         th_depth=100.0)
        slam = System(CAM, cfg)
        for k in span:
            img, dep = scene.render(CAM, *poses[k], h=240, w=320)
            slam.track_rgbd(img, dep, k / 30.0)
        return slam

    # session A covers frames 0..13, session B covers 10..25 (overlap 10..13)
    slam_a = run(range(0, 14))
    slam_b = run(range(10, 26))
    assert slam_a.n_keyframes >= 2 and slam_b.n_keyframes >= 2

    res = merge.merge_maps(slam_a.map, slam_b.map, CAM,
                           vocab=slam_a.loop_closer.vocab, fix_scale=True)
    assert res.success, "merge failed to find/solve the cross-map Sim3"
    m = res.map
    assert abs(res.scale - 1.0) < 0.1, f"scale {res.scale} (rgbd is metric)"

    # merged keyframe centers must agree with ground truth after merge:
    # session A's world == GT world (both start at identity), so B's
    # transformed keyframes should land on their GT positions
    kf_valid = np.asarray(m.kf_valid)
    fid = np.asarray(m.kf_frame_id)
    errs = []
    for s in np.nonzero(kf_valid)[0]:
        f = int(fid[s])
        f_true = f - 100000 + 10 if f >= 100000 else f  # B's ids offset
        R, t = poses[f_true]
        c_gt = -R.T @ t
        Rk = np.asarray(m.kf_R[int(s)])
        tk = np.asarray(m.kf_t[int(s)])
        c = -Rk.T @ tk
        errs.append(np.linalg.norm(c - c_gt))
    errs = np.asarray(errs)
    assert np.median(errs) < 0.15, f"median merged KF error {np.median(errs):.3f}"
