"""Micro-profile of extraction + tracking sub-stages on the real device."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, n=20, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def bench(name, fn, n=20):
    t = timeit(fn, n=n)
    print(f"{name:<34s}: {t*1e3:8.2f} ms")
    return t


def main():
    from orb_slam2_annotate_tpu.ops import fast, orb, pyramid, select
    from orb_slam2_annotate_tpu.ops import pallas_kernels
    from orb_slam2_annotate_tpu.ops.extractor import ExtractorConfig, extract

    print("devices:", jax.devices())
    H, W = 480, 640
    img = jnp.asarray((np.random.rand(H, W) * 255).astype(np.float32))

    # ---- pyramid
    f_pyr = jax.jit(lambda x: pyramid.build_pyramid(x, 8, 1.2))
    bench("build_pyramid (8 lvl)", lambda: jax.block_until_ready(f_pyr(img)))

    f_pyr_na = jax.jit(lambda x: [
        jax.image.resize(x, s, method="linear", antialias=False)
        for s in pyramid.pyramid_shapes(H, W, 8, 1.2)])
    bench("build_pyramid no-antialias", lambda: jax.block_until_ready(f_pyr_na(img)))

    # ---- FAST on level 0
    f_fast = jax.jit(lambda x: fast.fast_score_map(x, 7.0, 20.0))
    bench("fast_score_map L0 jnp", lambda: jax.block_until_ready(f_fast(img)))

    f_fastp = jax.jit(lambda x: pallas_kernels.fast_score_map_pallas(x, 7.0, 20.0))
    try:
        bench("fast_score_map L0 pallas", lambda: jax.block_until_ready(f_fastp(img)))
    except Exception as e:
        print("pallas fast FAILED:", repr(e)[:200])

    f_nms = jax.jit(fast.nms3x3)
    score, _ = f_fast(img)
    bench("nms3x3 L0", lambda: jax.block_until_ready(f_nms(score)))

    # ---- blur
    f_blur = jax.jit(pyramid.gaussian_blur)
    bench("gaussian_blur L0", lambda: jax.block_until_ready(f_blur(img)))

    # ---- select
    is_hi = score > 20.0
    f_sel = jax.jit(lambda s, h: select.select_keypoints(s, h, 235))
    bench("select_keypoints L0", lambda: jax.block_until_ready(f_sel(score, is_hi)))

    xy, resp, valid = f_sel(score, is_hi)

    # ---- angles + brief
    f_ang = jax.jit(orb.ic_angles)
    bench("ic_angles L0 (235)", lambda: jax.block_until_ready(f_ang(img, xy, valid)))
    ang = f_ang(img, xy, valid)
    blurred = f_blur(img)
    f_brief = jax.jit(orb.brief_descriptors)
    bench("brief L0 (235)", lambda: jax.block_until_ready(f_brief(blurred, xy, ang, valid)))

    # ---- full extract, and a 4-level variant
    cfg8 = ExtractorConfig(n_features=1024, n_levels=8)
    bench("extract 8 lvl 1024f", lambda: jax.block_until_ready(
        extract(img, cfg8).desc), n=10)

    # ---- tracking pieces
    from orb_slam2_annotate_tpu.geometry import CameraModel
    from orb_slam2_annotate_tpu.io import synthetic
    from orb_slam2_annotate_tpu.pipeline import SlamConfig, System
    from orb_slam2_annotate_tpu.pipeline import tracking as tk
    from orb_slam2_annotate_tpu.pipeline.frame import make_frame_mono
    from orb_slam2_annotate_tpu.solvers import pose_opt
    from orb_slam2_annotate_tpu.worldmap import map_state as ms

    cam = CameraModel.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                             width=640, height=480)
    cfg = SlamConfig(n_features=1024, max_kf=128, max_mp=16384,
                     max_frames_between_kf=6, init_min_matches=60)
    scene = synthetic.PlaneScene(seed=1)
    poses = synthetic.orbit_trajectory(24, step=0.05)
    frames = [np.clip(scene.render(cam, R, t)[0], 0, 255).astype(np.uint8)
              for R, t in poses]
    slam = System(cam, cfg)
    for k in range(20):
        slam.track_mono(frames[k], k / 30.0)
    slam.flush()

    fr = make_frame_mono(jnp.asarray(frames[20]), cam, cfg.extractor)
    jax.block_until_ready(fr.desc)
    m = slam.map
    vel_R, vel_t = slam.vel

    bench("track_with_motion_model", lambda: jax.block_until_ready(
        tk.track_with_motion_model(cam, m, fr, slam.last_frame, slam.last_obs,
                                   slam.R, slam.t)[0]))
    bench("track_reference_keyframe", lambda: jax.block_until_ready(
        tk.track_reference_keyframe(cam, m, fr, jnp.asarray(slam.ref_kf),
                                    slam.R, slam.t)[0]))
    bench("track_local_map", lambda: jax.block_until_ready(
        tk.track_local_map(cam, m, fr, slam.R, slam.t, slam.last_obs).R))

    pobs = tk._pose_obs_from_obs(m, fr, slam.last_obs)
    f_po = jax.jit(pose_opt.optimize_pose)
    bench("optimize_pose (4x10 LM)", lambda: jax.block_until_ready(
        f_po(cam, slam.R, slam.t, pobs)[0]))

    f_cov = jax.jit(ms.covisibility)
    bench("covisibility [K,K]", lambda: jax.block_until_ready(f_cov(m)))
    f_om = jax.jit(ms.observation_matrix)
    bench("observation_matrix [K,P]", lambda: jax.block_until_ready(f_om(m)))
    f_stats = jax.jit(ms.update_mappoint_stats)
    bench("update_mappoint_stats", lambda: jax.block_until_ready(
        f_stats(m).mp_desc), n=10)

    # keyframe-chain pieces
    from orb_slam2_annotate_tpu.pipeline import local_mapping as lm
    slot = jnp.asarray(slam.ref_kf)
    bench("create_new_mappoints", lambda: jax.block_until_ready(
        lm.create_new_mappoints(m, cam, slot, update_stats=False).mp_pos), n=10)
    bench("local_BA (16+16c,2048p)", lambda: jax.block_until_ready(
        lm.local_bundle_adjustment(
            jax.tree.map(lambda x: x.copy() if hasattr(x, 'copy') else x, m),
            cam, slot, update_stats=False).map.kf_R), n=5)
    bench("cull_keyframes", lambda: jax.block_until_ready(
        lm.cull_keyframes(m, slot, update_stats=False)[0].kf_valid), n=10)

    if slam.loop_closer is not None:
        lc = slam.loop_closer
        bench("loop dispatch_detection", lambda: jax.block_until_ready(
            lc.dispatch_detection(m, int(slot)).scores
            if hasattr(lc.dispatch_detection(m, int(slot)), 'scores')
            else None) if False else (lambda: None)(), n=1)


if __name__ == "__main__":
    main()
