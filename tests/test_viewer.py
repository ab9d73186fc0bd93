"""Interactive viewer (Viewer::Run analog): headless-driveable update
loop + the reference's GUI menu semantics as toggles."""

import numpy as np

from orb_slam2_annotate_tpu.geometry import CameraModel
from orb_slam2_annotate_tpu.io import synthetic
from orb_slam2_annotate_tpu.pipeline import SlamConfig, System
from orb_slam2_annotate_tpu.viz.viewer import InteractiveViewer


def test_interactive_viewer_updates_headless(tmp_path):
    cam = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                             width=320, height=240)
    cfg = SlamConfig(n_features=256, n_levels=3, max_kf=16, max_mp=4096,
                     init_min_matches=50, enable_loop_closing=False)
    slam = System(cam, cfg)
    viewer = InteractiveViewer(slam, every=2)
    scene = synthetic.PlaneScene(seed=1)
    poses = synthetic.orbit_trajectory(6, step=0.06)
    drawn = 0
    for k, (R, t) in enumerate(poses):
        img, _ = scene.render(cam, R, t, h=240, w=320)
        img = np.clip(img, 0, 255).astype(np.uint8)
        slam.track_mono(img, k / 30.0)
        if viewer.update(image=img, frame=slam.last_frame,
                         obs=slam.last_obs, force=(k == len(poses) - 1)):
            drawn += 1
    assert drawn >= 2
    viewer.savefig(str(tmp_path / "view.png"))
    assert (tmp_path / "view.png").stat().st_size > 1000

    # menu semantics: localization toggle reaches the System; reset works
    class Ev:
        def __init__(self, key):
            self.key = key

    viewer._on_key(Ev("l"))
    assert viewer.localization_mode and getattr(
        slam, "_localization_only", False)
    viewer._on_key(Ev("l"))
    assert not viewer.localization_mode
    viewer._on_key(Ev("f"))
    assert viewer.follow is False
    viewer._on_key(Ev("r"))      # reset
    assert slam.n_keyframes == 0
    viewer._on_key(Ev("q"))
    assert viewer.closed
    viewer.close()
