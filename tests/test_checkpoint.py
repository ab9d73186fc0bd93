"""Map checkpoint save/load roundtrip + relocalize-into-loaded-map."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_annotate_tpu.ops.orb import DESC_WORDS as DW, N_BITS as NB
from orb_slam2_annotate_tpu.geometry import CameraModel
from orb_slam2_annotate_tpu.io import checkpoint, synthetic
from orb_slam2_annotate_tpu.pipeline import SlamConfig, System
from orb_slam2_annotate_tpu.worldmap import map_state as ms


def test_checkpoint_roundtrip(tmp_path):
    m = ms.empty_map(8, 64, 32)
    m = ms.insert_keyframe(
        m, jnp.asarray(0), jnp.eye(3), jnp.asarray([0.1, 0.2, 0.3]),
        5, 1.5, jnp.zeros((32, 2)), jnp.full((32,), -1.0), jnp.zeros((32,)),
        jnp.zeros((32,), jnp.int32), jnp.zeros((32,)),
        jnp.ones((32, DW), jnp.uint32), jnp.ones((32,), bool),
        jnp.full((32,), -1, jnp.int32),
    )
    m = m._replace(mp_valid=m.mp_valid.at[3].set(True),
                   mp_pos=m.mp_pos.at[3].set(jnp.asarray([1.0, 2.0, 3.0])))
    path = str(tmp_path / "map.npz")
    checkpoint.save_map(path, m, extra={"note": "test"})
    m2, extra = checkpoint.load_map(path)
    assert extra["note"] == "test"
    for a, b in zip(m, m2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_system_save_load_and_relocalize(tmp_path):
    cam = CameraModel.create(fx=250., fy=250., cx=160., cy=120.,
                             bf=250. * 0.08, width=320, height=240)
    scene = synthetic.PlaneScene(seed=5)
    poses = synthetic.orbit_trajectory(12, step=0.06)
    cfg = SlamConfig(sensor="rgbd", n_features=512, n_levels=4, max_kf=32,
                     max_mp=4096, max_frames_between_kf=4, th_depth=100.0)
    slam = System(cam, cfg)
    for k, (R, t) in enumerate(poses):
        img, dep = scene.render(cam, R, t, h=240, w=320)
        slam.track_rgbd(img, dep, k / 30.0)
    assert slam.n_keyframes >= 2
    path = str(tmp_path / "map.npz")
    slam.save_map(path)

    # fresh system, load map, feed a frame from inside the mapped region:
    # must relocalize instead of re-initializing
    slam2 = System(cam, cfg)
    slam2.load_map(path)
    assert slam2.n_keyframes == slam.n_keyframes
    img, dep = scene.render(cam, *poses[6], h=240, w=320)
    T = slam2.track_rgbd(img, dep, 99.0)
    assert T is not None, "relocalization into loaded map failed"
    c_est = -T[:3, :3].T @ T[:3, 3]
    c_gt = -poses[6][0].T @ poses[6][1]
    assert np.linalg.norm(c_est - c_gt) < 0.30, (c_est, c_gt)


def test_localization_mode_freezes_map(tmp_path):
    cam = CameraModel.create(fx=250., fy=250., cx=160., cy=120.,
                             bf=250. * 0.08, width=320, height=240)
    scene = synthetic.PlaneScene(seed=5)
    poses = synthetic.orbit_trajectory(10, step=0.06)
    cfg = SlamConfig(sensor="rgbd", n_features=512, n_levels=4, max_kf=32,
                     max_mp=4096, max_frames_between_kf=4, th_depth=100.0)
    slam = System(cam, cfg)
    for k in range(8):
        img, dep = scene.render(cam, *poses[k], h=240, w=320)
        slam.track_rgbd(img, dep, k / 30.0)
    n_kf = slam.n_keyframes
    slam.activate_localization_mode()
    for k in range(8, 10):
        img, dep = scene.render(cam, *poses[k], h=240, w=320)
        T = slam.track_rgbd(img, dep, k / 30.0)
        assert T is not None
    assert slam.n_keyframes == n_kf, "localization mode must not add KFs"
