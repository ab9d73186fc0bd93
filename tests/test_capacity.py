"""Capacity-tier growth: the map must grow, never silently overwrite.

Round-1 verdict item 5: free_kf_slot returned slot 0 when the map was
full and a live keyframe was clobbered.  Now System._ensure_capacity
doubles the (K, P) tiers before insertion (SURVEY §7), so a sequence
producing more keyframes than the initial capacity completes with every
keyframe intact.
"""

import numpy as np
import jax.numpy as jnp

from orb_slam2_annotate_tpu.ops.orb import DESC_WORDS as DW, N_BITS as NB
from orb_slam2_annotate_tpu.geometry import CameraModel
from orb_slam2_annotate_tpu.io import synthetic
from orb_slam2_annotate_tpu.pipeline import SlamConfig, System
from orb_slam2_annotate_tpu.worldmap import map_state as ms

CAM = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                         width=320, height=240)


def test_grow_map_preserves_contents():
    m = ms.empty_map(4, 64, 16)
    m = ms.insert_keyframe(
        m, jnp.asarray(2), jnp.eye(3), jnp.ones(3), 7, 0.5,
        jnp.ones((16, 2)), jnp.full((16,), -1.0), jnp.zeros((16,)),
        jnp.zeros((16,), jnp.int32), jnp.zeros((16,)),
        jnp.ones((16, DW), jnp.uint32), jnp.ones((16,), bool),
        jnp.arange(16, dtype=jnp.int32),
    )
    m = m._replace(mp_valid=m.mp_valid.at[:16].set(True),
                   mp_pos=m.mp_pos.at[:16].set(3.0))

    g = ms.grow_map(m, new_K=8, new_P=128)
    assert g.K == 8 and g.P == 128 and g.N == 16
    assert bool(g.kf_valid[2]) and not bool(g.kf_valid[5])
    np.testing.assert_array_equal(np.asarray(g.kf_t[2]), np.ones(3))
    assert int(g.kf_frame_id[2]) == 7
    assert int(jnp.sum(g.mp_valid)) == 16
    np.testing.assert_array_equal(np.asarray(g.mp_pos[:16]),
                                  np.full((16, 3), 3.0))
    # new keyframe slots look empty / new point slots look free
    assert int(jnp.sum(g.kf_valid)) == 1
    assert np.all(np.asarray(g.kf_obs[4:]) == -1)
    assert np.all(np.isinf(np.asarray(g.mp_max_dist[64:])))
    # derived structure still works at the new shapes
    O = ms.observation_matrix(g)
    assert O.shape == (8, 128)
    assert int(jnp.sum(O[2])) == 16


def test_capacity_overflow_grows_not_overwrites():
    """Sequence forcing more keyframes than the initial K=8 capacity:
    the map must grow and every inserted (un-culled) keyframe must
    survive with a distinct frame id."""
    n_frames = 34
    scene = synthetic.PlaneScene(seed=1)
    poses = synthetic.orbit_trajectory(n_frames, step=0.06)

    cfg = SlamConfig(
        n_features=512, n_levels=4, max_kf=8, max_mp=8192,
        max_frames_between_kf=2, min_frames_between_kf=1,
        init_min_matches=50,
        enable_kf_culling=False,   # culling would legitimately free slots
        enable_loop_closing=False,
    )
    slam = System(CAM, cfg)
    for k, (R, t) in enumerate(poses):
        img, _ = scene.render(CAM, R, t, h=240, w=320)
        slam.track_mono(img, k / 30.0)
    slam.flush()

    assert slam.state == "OK", f"tracking state {slam.state}"
    assert slam.n_keyframes > 8, "test did not exceed the initial capacity"
    assert slam.map.K > 8, "map capacity never grew"
    v = np.asarray(slam.map.kf_valid)
    fids = np.asarray(slam.map.kf_frame_id)[v]
    # no keyframe was overwritten: all valid frame ids are distinct and
    # the count matches the monotonic insertion counter
    assert len(np.unique(fids)) == len(fids)
    assert slam.n_keyframes == int(slam.map.n_kf)
    # BoW database grew in lockstep (loop closer disabled ->
    # relocalization db still exists)
    if slam.loop_closer is not None:
        assert slam.loop_closer.db.bows.shape[0] == slam.map.K


def test_observation_overflow_telemetry():
    """VERDICT r2 item 10: MAX_OBS truncation must be observable."""
    K, P, N = ms.MAX_OBS + 8, 32, 8
    m = ms.empty_map(K, P, N)
    # every keyframe observes point 0 at feature 0 -> K observations of
    # one point, exceeding MAX_OBS
    for k in range(K):
        obs = np.full(N, -1, np.int32)
        obs[0] = 0
        m = ms.insert_keyframe(
            m, jnp.asarray(k), jnp.eye(3), jnp.zeros(3), k, 0.0,
            jnp.zeros((N, 2)), jnp.full((N,), -1.0), jnp.zeros((N,)),
            jnp.zeros((N,), jnp.int32), jnp.zeros((N,)),
            jnp.zeros((N, DW), jnp.uint32), jnp.ones((N,), bool),
            jnp.asarray(obs),
        )
    m = m._replace(mp_valid=m.mp_valid.at[0].set(True))
    n_over, dropped = ms.observation_overflow(m)
    assert int(n_over) == 1
    assert int(dropped) == K - ms.MAX_OBS


def test_gba_fold_after_capacity_growth():
    """VERDICT r2 item 10: grow the map WHILE a global BA is in flight,
    then fold — keyframes and points created after the snapshot (and
    after the growth) must be spanning-tree-propagated, not zeroed (the
    fold pads snapshot-shaped outputs; the pad rows must never alias
    live state)."""
    from orb_slam2_annotate_tpu.pipeline.loop_closing import (
        LoopCloser, LoopCloserConfig)

    cfg = SlamConfig(sensor="rgbd", n_features=256, n_levels=3,
                     max_kf=8, max_mp=2048, max_frames_between_kf=3,
                     th_depth=100.0, enable_loop_closing=False)
    cam = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                             bf=250.0 * 0.08, width=320, height=240)
    scene = synthetic.PlaneScene(seed=8)
    poses = synthetic.orbit_trajectory(14, step=0.06)
    slam = System(cam, cfg)
    for k in range(10):
        img, dep = scene.render(cam, *poses[k], h=240, w=320)
        slam.track_rgbd(img, dep, k / 30.0)
    slam.flush()
    m = slam.map
    assert slam.n_keyframes >= 3

    lc = LoopCloser(cam, m.K, LoopCloserConfig(fix_scale=True,
                                               use_dist_gba=False))
    lc._dispatch_global_ba(m, anchor=0)

    # capacity grows mid-solve, then a NEW keyframe + points arrive
    m = ms.grow_map(m, new_K=2 * m.K, new_P=2 * m.P)
    slam.map = m
    slam._kf_valid_host = np.concatenate(
        [slam._kf_valid_host,
         np.zeros(m.K - len(slam._kf_valid_host), bool)])
    if slam.loop_closer is not None:
        slam.loop_closer.grow_db(m.K)
    for k in range(10, 14):
        img, dep = scene.render(cam, *poses[k], h=240, w=320)
        slam.track_rgbd(img, dep, k / 30.0)
    slam.flush()
    m = slam.map
    n_kf_before = int(jnp.sum(m.kf_valid))
    n_mp_before = int(jnp.sum(m.mp_valid))

    m2 = lc.maybe_fold_gba(m, force=True)
    assert int(jnp.sum(m2.kf_valid)) == n_kf_before
    # no keyframe pose zeroed / non-finite
    R_ok = np.asarray(m2.kf_R)[np.asarray(m2.kf_valid)]
    assert np.all(np.isfinite(R_ok))
    assert np.all(np.abs(np.linalg.det(R_ok) - 1.0) < 1e-3), \
        "a folded keyframe rotation degenerated (zero-padding aliased)"
    # points created after the snapshot survive with finite positions
    pos_ok = np.asarray(m2.mp_pos)[np.asarray(m2.mp_valid)]
    assert np.all(np.isfinite(pos_ok))
    assert int(jnp.sum(m2.mp_valid)) >= int(0.9 * n_mp_before)
