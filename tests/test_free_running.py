"""Free-running (zero-read) device loop: the whole SLAM state machine as
one jitted program per frame (pipeline/device_loop.py).

The host never reads device values during the sequence; everything is
recovered from the rings at finish().  These tests verify the
free-running path initializes, tracks, inserts keyframes, and lands an
ATE in the same class as the synchronous System on the same sequence.
"""

import numpy as np
import pytest

from orb_slam2_annotate_tpu.geometry import CameraModel
from orb_slam2_annotate_tpu.io import evaluation, synthetic
from orb_slam2_annotate_tpu.pipeline import SlamConfig, System
from orb_slam2_annotate_tpu.pipeline.device_loop import FreeRunner

CAM = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                         width=320, height=240)


def _cfg(**kw):
    base = dict(n_features=512, n_levels=4, max_kf=32, max_mp=8192,
                max_frames_between_kf=6, init_min_matches=60,
                enable_loop_closing=False)
    base.update(kw)
    return SlamConfig(**base)


@pytest.mark.slow
def test_free_running_mono_tracks_and_maps():
    n_frames = 24
    scene = synthetic.PlaneScene(seed=1)
    poses = synthetic.orbit_trajectory(n_frames, step=0.05)

    runner = FreeRunner(CAM, _cfg(), max_frames=n_frames)
    for k, (R, t) in enumerate(poses):
        img, _ = scene.render(CAM, R, t, h=240, w=320)
        runner.track_mono(np.clip(img, 0, 255).astype(np.uint8), k / 30.0)
    out = runner.finish(resolve_loops=False)

    ok = [k for k, T in out["trajectory"] if T is not None]
    # mono init on the small-baseline orbit legitimately takes ~10 frames
    # (2.5 deg parallax gate); after it, every frame must track
    assert len(ok) >= 10, f"tracked {len(ok)}/{n_frames}"
    assert all(T is not None for k, T in out["trajectory"][ok[0]:]), \
        "tracking dropped out after initialization"
    assert out["n_keyframes"] >= 3
    assert out["n_mappoints"] > 100

    est, gt = [], []
    for k, T in out["trajectory"]:
        if T is None:
            continue
        est.append(-T[:3, :3].T @ T[:3, 3])
        Rg, tg = poses[k]
        gt.append(-Rg.T @ tg)
    rmse, _ = evaluation.ate_rmse(np.stack(est), np.stack(gt),
                                  with_scale=True)
    assert rmse < 0.10, f"free-running ATE {rmse:.3f} m"


@pytest.mark.slow
def test_free_running_matches_sync_class():
    """Free-running and synchronous paths on the same sequence must land
    in the same accuracy class (identical device programs, different
    orchestration)."""
    n_frames = 32
    scene = synthetic.PlaneScene(seed=3)
    poses = synthetic.orbit_trajectory(n_frames, step=0.05)
    frames = [np.clip(scene.render(CAM, R, t, h=240, w=320)[0],
                      0, 255).astype(np.uint8) for R, t in poses]

    runner = FreeRunner(CAM, _cfg(), max_frames=n_frames)
    for k, img in enumerate(frames):
        runner.track_mono(img, k / 30.0)
    out = runner.finish(resolve_loops=False)

    slam = System(CAM, _cfg())
    for k, img in enumerate(frames):
        slam.track_mono(img, k / 30.0)
    slam.flush()

    def ate(traj):
        est, gt = [], []
        for k, T in traj:
            if T is None:
                continue
            est.append(-T[:3, :3].T @ T[:3, 3])
            Rg, tg = poses[k]
            gt.append(-Rg.T @ tg)
        return evaluation.ate_rmse(np.stack(est), np.stack(gt),
                                   with_scale=True)[0]

    a_free = ate(out["trajectory"])
    a_sync = ate(slam.frame_trajectory())
    # r4: tightened from 3x to 1.5x after the policy unification
    # (pipeline/policy.py — both paths now compose the same predicates
    # and bootstrap builders; VERDICT r3 item 1 done-criterion)
    assert a_free < max(1.5 * a_sync, 0.03), \
        f"free {a_free:.4f} vs sync {a_sync:.4f}"


@pytest.mark.slow
def test_free_running_rgbd():
    n_frames = 16
    scene = synthetic.PlaneScene(seed=2)
    poses = synthetic.orbit_trajectory(n_frames, step=0.05)
    cam = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                             width=320, height=240, bf=250.0 * 0.08)

    runner = FreeRunner(cam, _cfg(sensor="rgbd", th_depth=100.0),
                        max_frames=n_frames)
    for k, (R, t) in enumerate(poses):
        img, dep = scene.render(cam, R, t, h=240, w=320)
        runner.track_rgbd(np.clip(img, 0, 255).astype(np.uint8), dep,
                          k / 30.0)
    out = runner.finish(resolve_loops=False)
    ok = [k for k, T in out["trajectory"] if T is not None]
    assert len(ok) > 0.6 * n_frames
    assert out["n_keyframes"] >= 2

    est, gt = [], []
    for k, T in out["trajectory"]:
        if T is None:
            continue
        est.append(-T[:3, :3].T @ T[:3, 3])
        Rg, tg = poses[k]
        gt.append(-Rg.T @ tg)
    # metric scale (no Sim3): RGB-D fixes scale
    rmse, _ = evaluation.ate_rmse(np.stack(est), np.stack(gt),
                                  with_scale=False)
    assert rmse < 0.15, f"free-running RGB-D ATE {rmse:.3f} m"


@pytest.mark.slow
def test_free_running_stereo():
    from tests.test_e2e_stereo import BASELINE as B
    n_frames = 16
    scene = synthetic.PlaneScene(seed=5)
    poses = synthetic.orbit_trajectory(n_frames, step=0.05)
    cam = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                             width=320, height=240, bf=250.0 * B)

    runner = FreeRunner(cam, _cfg(sensor="stereo", th_depth=100.0),
                        max_frames=n_frames)
    u8 = lambda im: np.clip(im, 0, 255).astype(np.uint8)
    for k, (R, t) in enumerate(poses):
        img_l, _ = scene.render(cam, R, t, h=240, w=320)
        t_r = np.asarray(t, np.float32) - np.array([B, 0, 0], np.float32)
        img_r, _ = scene.render(cam, R, t_r, h=240, w=320)
        runner.track_stereo(u8(img_l), u8(img_r), k / 30.0)
    out = runner.finish(resolve_loops=False)
    ok = [k for k, T in out["trajectory"] if T is not None]
    assert len(ok) > 0.6 * n_frames
    est, gt = [], []
    for k, T in out["trajectory"]:
        if T is None:
            continue
        est.append(-T[:3, :3].T @ T[:3, 3])
        Rg, tg = poses[k]
        gt.append(-Rg.T @ tg)
    rmse, _ = evaluation.ate_rmse(np.stack(est), np.stack(gt),
                                  with_scale=False)
    assert rmse < 0.15, f"free-running stereo metric ATE {rmse:.3f} m"


@pytest.mark.slow
def test_free_running_live_loop_closure():
    """The device-side loop funnel (free_loop_stage) must close the
    RoomScene circle LIVE — during the zero-read run, not at finish()."""
    n_frames = 180
    scene = synthetic.RoomScene(seed=2)
    poses = synthetic.circle_trajectory(n_frames, radius=1.8, turns=1.04)

    cfg = _cfg(max_kf=128, max_mp=16384, max_frames_between_kf=4,
               enable_loop_closing=True, enable_kf_culling=False)
    runner = FreeRunner(CAM, cfg, max_frames=n_frames)
    for k, (R, t) in enumerate(poses):
        img, _ = scene.render(CAM, R, t, h=240, w=320)
        runner.track_mono(np.clip(img, 0, 255).astype(np.uint8), k / 30.0)
    out = runner.finish(resolve_loops=False)

    assert out["n_loops_closed"] >= 1, "no live loop closed"
    # r4: global BA runs LIVE on device right after each closure
    # (live_gba branch, LoopClosing.cc:756 semantics) — not at finish()
    assert out["n_gba"] == out["n_loops_closed"], \
        f"live GBA ran {out['n_gba']}x for {out['n_loops_closed']} closures"
    # per-closure observability record (funnel numbers + gba flag)
    rec = out["closure_records"]
    assert rec.shape[0] == out["n_loops_closed"]
    assert rec[0, 3] >= 15, "closure record: entry matches missing"
    assert rec[0, 6] >= 6, "closure record: pair inliers missing"
    assert rec[0, 10] == 1.0, "closure record: live GBA flag not set"
    assert out["n_loop_edges_dropped"] == 0
    ok = [k for k, T in out["trajectory"] if T is not None]
    assert len(ok) > 0.7 * n_frames, f"tracked {len(ok)}/{n_frames}"

    est, gt = [], []
    for k, T in out["trajectory"]:
        if T is None:
            continue
        est.append(-T[:3, :3].T @ T[:3, 3])
        Rg, tg = poses[k]
        gt.append(-Rg.T @ tg)
    rmse, _ = evaluation.ate_rmse(np.stack(est), np.stack(gt),
                                  with_scale=True)
    assert rmse < 0.25, f"post-closure ATE {rmse:.3f} m"


@pytest.mark.slow
def test_scan_batch_mode_matches_per_frame():
    """track_mono_sequence (chunked lax.scan batch dispatch) runs the
    SAME per-frame step body; the trajectory must agree with the
    streaming API on identical frames (tail shorter than a chunk runs
    per-frame)."""
    cam = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                             width=320, height=240)
    scene = synthetic.PlaneScene(seed=1)
    n = 28
    poses = synthetic.orbit_trajectory(n, step=0.05)
    frames = np.stack([np.clip(scene.render(cam, R, t, h=240, w=320)[0],
                               0, 255).astype(np.uint8) for R, t in poses])
    cfg = SlamConfig(n_features=512, n_levels=4, max_kf=32, max_mp=8192,
                     max_frames_between_kf=6, init_min_matches=60,
                     enable_loop_closing=False)

    def ate(out):
        tr = [(k, T) for k, T in out["trajectory"] if T is not None]
        est = np.stack([-T[:3, :3].T @ T[:3, 3] for _, T in tr])
        gt = np.stack([-poses[k][0].T @ poses[k][1] for k, _ in tr])
        return len(tr), evaluation.ate_rmse(est, gt, with_scale=True)[0]

    r1 = FreeRunner(cam, cfg, max_frames=n, auto_grow=False)
    for k in range(n):
        r1.track_mono(frames[k], k / 30.0)
    n1, a1 = ate(r1.finish())

    r2 = FreeRunner(cam, cfg, max_frames=n, auto_grow=False)
    r2.track_mono_sequence(frames, chunk=8)  # 3 chunks + 4-frame tail
    n2, a2 = ate(r2.finish())

    assert n1 >= 16
    assert abs(n2 - n1) <= 2, f"scan tracked {n2} vs per-frame {n1}"
    assert abs(a2 - a1) < max(0.5 * a1, 0.01), \
        f"scan ATE {a2:.4f} vs per-frame {a1:.4f}"
