"""Sync-vs-free parity matrix (VERDICT r3 items 1 + 5).

The synchronous System and the free-running FreeRunner now compose the
SAME shared policy/builder functions (pipeline/policy.py) around the
same device programs; these tests pin their equivalence across all three
sensors and the recovery scenarios the free path gained in round 4:
auto-reset after early loss, capacity growth on a full map,
localization mode, and save/load + relocalization.
"""

import os
import tempfile

import numpy as np
import pytest

from orb_slam2_annotate_tpu.geometry import CameraModel
from orb_slam2_annotate_tpu.io import evaluation, synthetic
from orb_slam2_annotate_tpu.pipeline import SlamConfig, System
from orb_slam2_annotate_tpu.pipeline.device_loop import FreeRunner

CAM = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                         width=320, height=240)
CAM_D = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                           width=320, height=240, bf=250.0 * 0.08)


def _cfg(**kw):
    base = dict(n_features=512, n_levels=4, max_kf=32, max_mp=8192,
                max_frames_between_kf=6, init_min_matches=60,
                enable_loop_closing=False)
    base.update(kw)
    return SlamConfig(**base)


def _frames(n, seed=1, cam=CAM, step=0.05):
    # seed 1: both paths initialize early.  (Seed 3 is a measured
    # robustness asymmetry: the free path's 512-hypothesis init
    # bootstraps by frame ~8 while the sync path's 200-hypothesis
    # restart-on-starvation loop takes until frame ~26 — real behavior,
    # not what this parity test pins.)
    scene = synthetic.PlaneScene(seed=seed)
    poses = synthetic.orbit_trajectory(n, step=step)
    out = []
    for R, t in poses:
        img, dep = scene.render(cam, R, t, h=240, w=320)
        out.append((np.clip(img, 0, 255).astype(np.uint8), dep))
    return poses, out


def _ate(traj, poses):
    est, gt = [], []
    for k, T in traj:
        if T is None:
            continue
        est.append(-T[:3, :3].T @ T[:3, 3])
        Rg, tg = poses[k]
        gt.append(-Rg.T @ tg)
    assert len(est) >= 8, f"only {len(est)} tracked frames"
    return evaluation.ate_rmse(np.stack(est), np.stack(gt),
                               with_scale=True)[0]


def _run_free(cfg, frames, cam=CAM, sensor="mono"):
    r = FreeRunner(cam, cfg, max_frames=len(frames))
    for k, f in enumerate(frames):
        if sensor == "mono":
            r.track_mono(f[0], k / 30.0)
        elif sensor == "rgbd":
            r.track_rgbd(f[0], f[1], k / 30.0)
        else:
            r.track_stereo(f[0], f[1], k / 30.0)
    return r, r.finish()


def _run_sync(cfg, frames, cam=CAM, sensor="mono"):
    s = System(cam, cfg)
    for k, f in enumerate(frames):
        if sensor == "mono":
            s.track_mono(f[0], k / 30.0)
        elif sensor == "rgbd":
            s.track_rgbd(f[0], f[1], k / 30.0)
        else:
            s.track_stereo(f[0], f[1], k / 30.0)
    s.flush()
    return s


@pytest.mark.slow
@pytest.mark.parametrize("sensor", ["mono", "rgbd"])
def test_parity_ate_within_1p5x(sensor):
    """Free-path ATE within 1.5x of the sync path on the same frames
    (VERDICT r3 item 1 done-criterion; was 3x in round 3)."""
    cam = CAM if sensor == "mono" else CAM_D
    cfg = _cfg() if sensor == "mono" else _cfg(sensor=sensor, th_depth=100.0)
    poses, frames = _frames(32, cam=cam)
    _, out = _run_free(cfg, frames, cam, sensor)
    sync = _run_sync(cfg, frames, cam, sensor)
    a_free = _ate(out["trajectory"], poses)
    a_sync = _ate(sync.frame_trajectory(), poses)
    assert a_free < max(1.5 * a_sync, 0.03), \
        f"{sensor}: free {a_free:.4f} vs sync {a_sync:.4f}"


@pytest.mark.slow
def test_parity_ate_stereo():
    """Right images rendered from a truly displaced camera (rectified
    geometry, like test_e2e_stereo)."""
    baseline = 0.3
    cam = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                             bf=250.0 * baseline, width=320, height=240)
    cfg = _cfg(sensor="stereo", th_depth=100.0)
    scene = synthetic.PlaneScene(seed=5)
    poses = synthetic.orbit_trajectory(24, step=0.05)
    frames = []
    for R, t in poses:
        img_l, _ = scene.render(cam, R, t, h=240, w=320)
        t_r = np.asarray(t, np.float32) - np.array([baseline, 0, 0],
                                                   np.float32)
        img_r, _ = scene.render(cam, R, t_r, h=240, w=320)
        u8 = lambda im: np.clip(im, 0, 255).astype(np.uint8)
        frames.append((u8(img_l), u8(img_r)))
    _, out = _run_free(cfg, frames, cam, "stereo")
    sync = _run_sync(cfg, frames, cam, "stereo")
    a_free = _ate(out["trajectory"], poses)
    a_sync = _ate(sync.frame_trajectory(), poses)
    assert a_free < max(1.5 * a_sync, 0.05), \
        f"stereo: free {a_free:.4f} vs sync {a_sync:.4f}"


@pytest.mark.slow
def test_free_auto_reset_then_reinit():
    """Tracking lost with a <=5-keyframe map wipes it and re-initializes
    (Tracking.cc:496-504 auto-reset as a device branch)."""
    poses, frames = _frames(40, seed=1)
    blank = (np.zeros((240, 320), np.uint8), np.ones((240, 320), np.float32))
    seq = frames[:14] + [blank] * 6 + frames[20:40]
    r = FreeRunner(CAM, _cfg(), max_frames=len(seq), auto_grow=False)
    for k, (img, _) in enumerate(seq):
        r.track_mono(img, k / 30.0)
    out = r.finish()
    assert out["n_resets"] >= 1
    tracked_after = [k for k, T in out["trajectory"][20:] if T is not None]
    assert len(tracked_after) >= 8, "did not re-initialize after reset"
    assert out["n_keyframes"] >= 2
    # sync path behavior on the same sequence: also resets and recovers
    sync = _run_sync(_cfg(), seq)
    assert sync.n_keyframes >= 2


@pytest.mark.slow
def test_free_capacity_growth():
    """A tiny keyframe tier grows (device-state migration + re-jit)
    instead of silently refusing keyframes (VERDICT r3 missing 1)."""
    poses, frames = _frames(24, seed=1)
    r = FreeRunner(CAM, _cfg(max_kf=8), max_frames=8)  # rings grow too
    for k, (img, _) in enumerate(frames):
        r.track_mono(img, k / 30.0)
    out = r.finish()
    assert r.cfg.max_kf > 8, "keyframe tier never grew"
    assert r.max_frames >= len(frames), "rings never grew"
    assert out["n_kf_skipped_full"] == 0, \
        f"{out['n_kf_skipped_full']} keyframes silently skipped"
    assert _ate(out["trajectory"], poses) < 0.10


@pytest.mark.slow
def test_free_localization_mode():
    """activate_localization_mode freezes the map (no new keyframes)
    while tracking continues (System.cc:229-251)."""
    poses, frames = _frames(32)
    r = FreeRunner(CAM, _cfg(), max_frames=len(frames), auto_grow=False)
    for k, (img, _) in enumerate(frames[:16]):
        r.track_mono(img, k / 30.0)
    r.activate_localization_mode()
    for k in range(16, 32):
        r.track_mono(frames[k][0], k / 30.0)
    out = r.finish()
    n_after = len([k for k, T in out["trajectory"][16:] if T is not None])
    assert n_after >= 12, f"localization mode lost tracking ({n_after}/16)"
    # every keyframe was created before activation (frame id < 16)
    m = out["map"]
    fids = np.asarray(m.kf_frame_id)[np.asarray(m.kf_valid)]
    assert fids.max() < 16, f"keyframe created in localization mode: {fids}"


@pytest.mark.slow
def test_free_save_load_reloc():
    """save_map / load_map + relocalization into the loaded map — the
    free-path analog of System.load_map (System.h:115-117 TODO)."""
    poses, frames = _frames(32)
    r = FreeRunner(CAM, _cfg(), max_frames=len(frames), auto_grow=False)
    for k, (img, _) in enumerate(frames[:20]):
        r.track_mono(img, k / 30.0)
    out = r.finish()
    assert out["n_keyframes"] >= 3
    path = os.path.join(tempfile.mkdtemp(), "freemap.npz")
    r.save_map(path)

    r2 = FreeRunner(CAM, _cfg(), max_frames=16, auto_grow=False)
    r2.load_map(path)
    for i, k in enumerate(range(8, 20)):
        r2.track_mono(frames[k][0], i / 30.0)
    out2 = r2.finish()
    tracked = [k for k, T in out2["trajectory"] if T is not None]
    assert len(tracked) >= 8, "failed to relocalize into the loaded map"
    assert out2["n_resets"] == 0, "loaded map must not be auto-reset"
