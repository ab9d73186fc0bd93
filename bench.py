"""Benchmark: steady-state tracking throughput (frames/sec/chip).

Metric definition (BASELINE.md): frames/sec/chip of the full per-frame
pipeline — ORB extraction, projection matching, motion-only pose
optimization, local-map tracking — including amortized keyframe work
(triangulation + local BA every few frames), on the synthetic benchmark
sequence.  The reference baseline is the i7 real-time claim of 30 fps on
TUM-class sequences (reference README.md:65, Camera.fps in
Examples/Monocular/TUM1.yaml).

Round-3 architecture: the free-running device loop
(pipeline/device_loop.py) — the whole per-frame state machine is ONE
jitted program and the host performs ZERO device->host reads during the
timed region (any read permanently degrades the axon remote-TPU session
to a ~25 ms dispatch floor; r2's per-frame stats read was the 28-fps
ceiling).  Results (trajectory, map, ATE) are read once at the end,
after timing.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_FPS = 30.0  # reference i7 real-time rate (README.md:65)


def _ensure_usable_backend(probe_timeout_s: float = 90.0, retries: int = 6):
    """The axon TPU claim is exclusive, and a claim attempted too soon
    after the previous holder exits can wedge FOREVER (the grant is lost;
    that process never recovers, but a fresh process a few minutes later
    succeeds — measured behavior).  Probe device init in a subprocess;
    on a hang, kill the probe, wait, and retry with fresh processes
    before giving up and falling back to CPU, so the benchmark always
    reports and strongly prefers the real chip.
    """
    if os.environ.get("ORBTPU_BENCH_CHILD"):
        return
    for attempt in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                timeout=probe_timeout_s, capture_output=True, text=True,
            )
            if r.returncode == 0 and "ok" in r.stdout:
                return
        except subprocess.TimeoutExpired:
            pass
        print(f"bench: TPU probe {attempt + 1}/{retries} failed "
              "(wedged claim?) — retrying in 60s", file=sys.stderr)
        time.sleep(60.0)
    print("bench: TPU backend unavailable — falling back to CPU",
          file=sys.stderr)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["ORBTPU_BENCH_CHILD"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


_ensure_usable_backend()


def main():
    from orb_slam2_annotate_tpu.geometry import CameraModel
    from orb_slam2_annotate_tpu.io import evaluation, synthetic
    from orb_slam2_annotate_tpu.pipeline import SlamConfig
    from orb_slam2_annotate_tpu.pipeline.device_loop import FreeRunner

    n_warm = 16
    n_bench = 96
    n_frames = n_warm + n_bench

    cam = CameraModel.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                             width=640, height=480)
    scene = synthetic.PlaneScene(seed=1)
    poses = synthetic.orbit_trajectory(n_frames, step=0.05)

    cfg = SlamConfig(n_features=1024, max_kf=128, max_mp=16384,
                     max_frames_between_kf=6, init_min_matches=60)
    runner = FreeRunner(cam, cfg, max_frames=n_frames)

    # pre-render all frames so host rendering is outside the timed loop;
    # uint8 like a real camera (4x less host->device traffic)
    frames = [np.clip(scene.render(cam, R, t)[0], 0, 255).astype(np.uint8)
              for R, t in poses]

    # compile + first-execute the step program, run the warmup segment
    # (map bootstrap) and wait for it — WITHOUT reading anything
    runner.warmup()
    for k in range(n_warm):
        runner.track_mono(frames[k], k / 30.0)
    runner.block()

    # timed region: dispatch the steady-state segment and wait for the
    # device to drain.  Zero host<->device reads inside.
    t0 = time.perf_counter()
    for k in range(n_warm, n_frames):
        runner.track_mono(frames[k], k / 30.0)
    runner.block()
    total = time.perf_counter() - t0

    # one-shot readback AFTER timing: validity + accuracy
    out = runner.finish(resolve_loops=False)
    tracked = [(k, T) for k, T in out["trajectory"] if T is not None]
    ok = (len(tracked) > 0.7 * n_frames and out["n_keyframes"] >= 3
          and int(out["modes"][-1]) == 2)
    fps = n_bench / total if total > 0 else 0.0
    if not ok:
        fps = 0.0

    est = np.stack([-T[:3, :3].T @ T[:3, 3] for _, T in tracked])
    gt = np.stack([-poses[k][0].T @ poses[k][1] for k, _ in tracked])
    rmse, _ = evaluation.ate_rmse(est, gt, with_scale=True)
    print(f"bench: tracked={len(tracked)}/{n_frames} "
          f"kfs={out['n_keyframes']} mps={out['n_mappoints']} "
          f"ate={rmse * 100:.2f}cm total={total:.3f}s", file=sys.stderr)
    print(json.dumps({
        "metric": "synthetic_mono_tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
