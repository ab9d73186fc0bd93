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


def run_sensor_bench(sensor: str = "mono", n_warm: int = 16,
                     n_bench: int = 96):
    """Steady-state fps/chip for one sensor path (VERDICT r3 item 10:
    stereo doubles extraction work and runs the SAD sub-pixel row
    matcher; RGB-D adds the depth-seeded point path).  Returns a dict."""
    from orb_slam2_annotate_tpu.geometry import CameraModel
    from orb_slam2_annotate_tpu.io import evaluation, synthetic
    from orb_slam2_annotate_tpu.pipeline import SlamConfig
    from orb_slam2_annotate_tpu.pipeline.device_loop import FreeRunner

    n_frames = n_warm + n_bench
    baseline = 0.3
    cam = CameraModel.create(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480,
        bf=(500.0 * baseline if sensor != "mono" else 0.0))
    scene = synthetic.PlaneScene(seed=1)
    poses = synthetic.orbit_trajectory(n_frames, step=0.05)

    kw = {} if sensor == "mono" else dict(sensor=sensor, th_depth=100.0)
    cfg = SlamConfig(n_features=1024, max_kf=128, max_mp=16384,
                     max_frames_between_kf=6, init_min_matches=60, **kw)
    runner = FreeRunner(cam, cfg, max_frames=n_frames, auto_grow=False)

    # pre-render all frames so host rendering is outside the timed loop;
    # uint8 like a real camera (4x less host->device traffic)
    u8 = lambda im: np.clip(im, 0, 255).astype(np.uint8)
    frames = []
    for R, t in poses:
        img, dep = scene.render(cam, R, t)
        if sensor == "stereo":
            # rectified right camera: displaced by the baseline along the
            # camera x axis (t_R = t_L - [b,0,0], as in test_e2e_stereo)
            t_r = np.asarray(t, np.float32) - np.asarray(
                [baseline, 0, 0], np.float32)
            img_r, _ = scene.render(cam, R, t_r)
            frames.append((u8(img), u8(img_r)))
        elif sensor == "rgbd":
            frames.append((u8(img), dep.astype(np.float32)))
        else:
            frames.append((u8(img),))

    def track(k):
        if sensor == "stereo":
            runner.track_stereo(frames[k][0], frames[k][1], k / 30.0)
        elif sensor == "rgbd":
            runner.track_rgbd(frames[k][0], frames[k][1], k / 30.0)
        else:
            runner.track_mono(frames[k][0], k / 30.0)

    # compile + first-execute the step program, run the warmup segment
    # (map bootstrap) and wait for it — WITHOUT reading anything
    runner.warmup()
    for k in range(n_warm):
        track(k)
    runner.block()

    # timed region: dispatch the steady-state segment and wait for the
    # device to drain.  Zero host<->device reads inside.
    t0 = time.perf_counter()
    for k in range(n_warm, n_frames):
        track(k)
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
    rmse, _ = evaluation.ate_rmse(est, gt,
                                  with_scale=(sensor == "mono"))
    print(f"bench[{sensor}]: tracked={len(tracked)}/{n_frames} "
          f"kfs={out['n_keyframes']} mps={out['n_mappoints']} "
          f"ate={rmse * 100:.2f}cm total={total:.3f}s", file=sys.stderr)
    return dict(fps=round(fps, 2), ate_cm=round(float(rmse) * 100, 2),
                tracked=len(tracked), n_frames=n_frames,
                n_keyframes=out["n_keyframes"])


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sensor", default="mono",
                    choices=["mono", "stereo", "rgbd"])
    ap.add_argument("--skip-extras", action="store_true",
                    help="headline metric only (no depth-sensor rows, "
                         "no long run)")
    ap.add_argument("--long-frames", type=int, default=1248)
    args = ap.parse_args()

    res = run_sensor_bench(args.sensor)
    fps = res["fps"]
    record = {
        "metric": f"synthetic_{args.sensor}_tracking_fps",
        "value": fps,
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }

    if args.sensor == "mono" and not args.skip_extras:
        # depth-sensor variants (reference: stereo_kitti.cc timing)
        try:
            record["sensors"] = {
                "stereo": run_sensor_bench("stereo"),
                "rgbd": run_sensor_bench("rgbd"),
            }
        except Exception as e:  # never lose the headline metric
            print(f"bench: sensor variants failed: {e!r}", file=sys.stderr)
        # long-sequence stress (VERDICT r3 item 3): 1248-frame multi-loop
        # spiral with live closures + in-program GBA + capacity growth
        try:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from tools.bench_long import run_long

            record["long_run"] = run_long(n_frames=args.long_frames)
        except Exception as e:
            print(f"bench: long run failed: {e!r}", file=sys.stderr)

    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
