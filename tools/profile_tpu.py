"""Per-stage TPU profiling of the bench workload.

Measures, in steady state on the real device:
  - raw dispatch round-trip (tiny no-op jit)
  - host->device image upload
  - ORB extraction (make_frame_mono) enqueue + complete
  - fused tracking step enqueue + complete
  - full keyframe chain
  - end-to-end bench-equivalent loop with telemetry report
"""

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


def main():
    from orb_slam2_annotate_tpu.geometry import CameraModel
    from orb_slam2_annotate_tpu.io import synthetic
    from orb_slam2_annotate_tpu.pipeline import SlamConfig, System
    from orb_slam2_annotate_tpu.pipeline.frame import make_frame_mono
    from orb_slam2_annotate_tpu.pipeline import tracking as tk

    print("devices:", jax.devices())

    # ---- raw dispatch latency
    noop = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,))
    noop(x).block_until_ready()
    t = timeit(lambda: noop(x).block_until_ready(), n=50)
    print(f"noop dispatch+sync      : {t*1e3:8.2f} ms")

    # ---- image upload
    img_np = (np.random.rand(480, 640) * 255).astype(np.uint8)
    t = timeit(lambda: jnp.asarray(img_np).block_until_ready(), n=30)
    print(f"upload 640x480 u8       : {t*1e3:8.2f} ms")

    cam = CameraModel.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                             width=640, height=480)
    cfg = SlamConfig(n_features=1024, max_kf=128, max_mp=16384,
                     max_frames_between_kf=6, init_min_matches=60,
                     async_depth=3)

    # ---- extraction
    ecfg = cfg.extractor
    img_dev = jnp.asarray(img_np)
    f = make_frame_mono(img_dev, cam, ecfg)
    jax.block_until_ready(f.desc)
    def run_extract():
        fr = make_frame_mono(img_dev, cam, ecfg)
        jax.block_until_ready(fr.desc)
    t = timeit(run_extract, n=20)
    print(f"extract (1024f, 8 lvl)  : {t*1e3:8.2f} ms")

    # ---- full system loop, with per-stage telemetry
    scene = synthetic.PlaneScene(seed=1)
    n_frames = 64
    poses = synthetic.orbit_trajectory(n_frames, step=0.05)
    frames = [np.clip(scene.render(cam, R, t0)[0], 0, 255).astype(np.uint8)
              for R, t0 in poses]

    slam = System(cam, cfg)
    for k in range(16):
        slam.track_mono(frames[k], k / 30.0)
    slam.flush()

    # tracking step alone in steady state (reuse slam state)
    fr = make_frame_mono(jnp.asarray(frames[16]), cam, ecfg)
    jax.block_until_ready(fr.desc)
    vel_R, vel_t = slam.vel if slam.vel is not None else (jnp.eye(3), jnp.zeros(3))
    def run_track():
        step = tk.track_frame(cam, slam.map, fr, slam.last_frame,
                              slam.last_obs, slam.R, slam.t, vel_R, vel_t,
                              jnp.asarray(True), jnp.asarray(slam.ref_kf, jnp.int32))
        jax.block_until_ready(step.stats)
    t = timeit(run_track, n=20)
    print(f"track_frame (fused)     : {t*1e3:8.2f} ms")

    # keyframe chain cost: run _create_keyframe once, timed
    slam.telemetry.reset()
    t0 = time.perf_counter()
    for k in range(16, n_frames):
        slam.track_mono(frames[k], k / 30.0)
    slam.flush()
    total = time.perf_counter() - t0
    print(f"\nsteady loop {n_frames-16} frames : {total:6.2f} s  "
          f"({(n_frames-16)/total:.2f} fps)")
    print(slam.telemetry.report())
    print(f"keyframes={slam.n_keyframes} mappoints={slam.n_mappoints} "
          f"state={slam.state}")


if __name__ == "__main__":
    main()
