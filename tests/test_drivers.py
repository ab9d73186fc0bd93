"""Driver fixture tests (VERDICT r2 item 6): the dataset drivers
(examples/run_tum.py, run_kitti.py) must EXECUTE end-to-end from
on-disk fixtures — no network datasets exist in this environment, so
tiny TUM-layout / KITTI-layout sequences are written from the synthetic
renderer and the drivers run as subprocesses, exactly like a user
invoking them (mono_tum.cc:36-124 analog), then their trajectory
outputs are re-parsed.
"""

import os
import subprocess
import sys

import numpy as np
import pytest


def _write_png(path, img):
    import matplotlib.image as mpimg

    mpimg.imsave(path, np.clip(img, 0, 255).astype(np.uint8),
                 cmap="gray", vmin=0, vmax=255)


SETTINGS_YAML = """%YAML:1.0
Camera.fx: 250.0
Camera.fy: 250.0
Camera.cx: 160.0
Camera.cy: 120.0
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.k3: 0.0
Camera.fps: 30.0
Camera.bf: 20.0
Camera.RGB: 1
Camera.width: 320
Camera.height: 240
ThDepth: 100.0
DepthMapFactor: 5000.0
ORBextractor.nFeatures: 512
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 4
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def _render_frames(n):
    from orb_slam2_annotate_tpu.geometry import CameraModel
    from orb_slam2_annotate_tpu.io import synthetic

    cam = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                             width=320, height=240)
    scene = synthetic.PlaneScene(seed=9)
    poses = synthetic.orbit_trajectory(n, step=0.06)
    return [scene.render(cam, R, t, h=240, w=320)[0] for R, t in poses]


def _run_driver(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                      capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, f"driver failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    return r


@pytest.mark.slow
def test_run_tum_mono_from_fixture(tmp_path):
    n = 16
    frames = _render_frames(n)
    seq = tmp_path / "tum_seq"
    (seq / "rgb").mkdir(parents=True)
    with open(seq / "rgb.txt", "w") as f:
        f.write("# color images\n")
        for k, img in enumerate(frames):
            rel = f"rgb/{k:04d}.png"
            _write_png(str(seq / rel), img)
            f.write(f"{k / 30.0:.6f} {rel}\n")
    with open(tmp_path / "settings.yaml", "w") as f:
        f.write(SETTINGS_YAML)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _run_driver([os.path.join(repo, "examples", "run_tum.py"), "mono",
                 str(tmp_path / "settings.yaml"), str(seq)],
                cwd=str(tmp_path))

    # outputs exist and re-parse in TUM format
    for name in ("CameraTrajectory.txt", "KeyFrameTrajectory.txt"):
        rows = np.loadtxt(str(tmp_path / name))
        assert rows.ndim == 2 and rows.shape[1] == 8, name
        q = rows[:, 4:8]
        assert np.allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-3)
    assert np.loadtxt(str(tmp_path / "KeyFrameTrajectory.txt")).shape[0] >= 2


@pytest.mark.slow
def test_run_kitti_mono_from_fixture(tmp_path):
    n = 16
    frames = _render_frames(n)
    seq = tmp_path / "kitti_seq"
    (seq / "image_0").mkdir(parents=True)
    for k, img in enumerate(frames):
        _write_png(str(seq / "image_0" / f"{k:06d}.png"), img)
    with open(seq / "times.txt", "w") as f:
        for k in range(n):
            f.write(f"{k / 10.0:.6e}\n")
    with open(tmp_path / "settings.yaml", "w") as f:
        f.write(SETTINGS_YAML)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _run_driver([os.path.join(repo, "examples", "run_kitti.py"), "mono",
                 str(tmp_path / "settings.yaml"), str(seq)],
                cwd=str(tmp_path))

    # KITTI format: 12 columns (3x4 row-major), one row per frame
    rows = np.loadtxt(str(tmp_path / "CameraTrajectory.txt"))
    assert rows.ndim == 2 and rows.shape[1] == 12
    R0 = rows[-1].reshape(3, 4)[:, :3]
    assert abs(np.linalg.det(R0) - 1.0) < 1e-2


def test_load_image_gray_without_cv2(tmp_path, monkeypatch):
    """The pure-Python decode path must work when cv2 is absent."""
    import builtins

    from orb_slam2_annotate_tpu.io import datasets

    img = (np.random.RandomState(0).rand(24, 32) * 255).astype(np.uint8)
    _write_png(str(tmp_path / "x.png"), img)

    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError("cv2 disabled for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_cv2)
    out = datasets.load_image_gray(str(tmp_path / "x.png"))
    assert out.shape == (24, 32)
    assert float(np.abs(out - img).max()) <= 2.0


@pytest.mark.slow
def test_run_euroc_mono_from_fixture(tmp_path):
    """EuRoC mav0 layout: cam0/data/<ns>.png + a timestamp list file
    (mono_euroc.cc LoadImages)."""
    n = 16
    frames = _render_frames(n)
    seq = tmp_path / "mav0"
    (seq / "cam0" / "data").mkdir(parents=True)
    ts_lines = []
    for k, img in enumerate(frames):
        ns = str(1403636579763555584 + k * 50_000_000)  # ~20 Hz in ns
        _write_png(str(seq / "cam0" / "data" / f"{ns}.png"), img)
        ts_lines.append(ns)
    with open(tmp_path / "timestamps.txt", "w") as f:
        f.write("\n".join(ts_lines) + "\n")
    with open(tmp_path / "settings.yaml", "w") as f:
        f.write(SETTINGS_YAML)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _run_driver([os.path.join(repo, "examples", "run_euroc.py"), "mono",
                 str(tmp_path / "settings.yaml"), str(seq),
                 str(tmp_path / "timestamps.txt")],
                cwd=str(tmp_path))

    rows = np.loadtxt(str(tmp_path / "CameraTrajectory.txt"))
    assert rows.ndim == 2 and rows.shape[1] == 8
    q = rows[:, 4:8]
    assert np.allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-3)
