"""Benchmark: steady-state tracking throughput (frames/sec/chip).

Metric definition (BASELINE.md): frames/sec/chip of the full per-frame
pipeline — ORB extraction, projection matching, motion-only pose
optimization, local-map tracking — including amortized keyframe work
(triangulation + local BA every few frames), on the synthetic benchmark
sequence.  The reference baseline is the i7 real-time claim of 30 fps on
TUM-class sequences (reference README.md:65, Camera.fps in
Examples/Monocular/TUM1.yaml).

Round-5 harness — HONEST timing (supersedes the r3/r4 artifacts, whose
fps timed dispatch-only regions against a lying block, see below):

* Measured axon-runtime semantics (r5 re-characterization, RESULTS.md):
  in a session that has never done a device->host read,
  `block_until_ready` returns immediately WITHOUT waiting — r3/r4
  "timed regions" measured host dispatch rate, not execution.  After
  one tiny read, dispatch stays asynchronous, block truly waits, and
  execution runs at full device speed; each further read costs one
  ~25 ms link round trip.
* This harness therefore SANITIZES the session with one tiny read
  before any timing, then times dispatch+block regions (now truthful,
  verified by the probes below), with zero reads inside timed loops.
* Probes recorded in the artifact: us/dispatch of a tiny op chain
  (dispatch+truthful block) and the read round-trip (ms) — evidence
  the session was in the sane regime when timed.
* The headline JSON line prints IMMEDIATELY after the mono timed
  segment; progressively richer record lines follow; the LAST line is
  authoritative.  A timeout at any point leaves a valid line.
* The long run's frame rendering is disk-cached
  (synthetic.render_frames_cached) and its dispatch loop stops at a
  wall-clock budget, at a block boundary, so the readback phase is
  always reached.
* Segments per sensor: A = streaming (per-frame H2D upload + dispatch),
  B = pre-uploaded streaming (dispatch-only loop), C (mono) = chunked
  lax.scan batch mode (one dispatch per 48 frames).

Prints JSON lines of the form
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
(the last printed line is the complete artifact).
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

# persistent XLA compile cache for the TPU path: executable
# serialization is only unreliable for XLA:CPU AOT (tests/conftest.py);
# TPU entries make the driver's end-of-round run skip the multi-minute
# step-program compiles this round's warm run already paid for
if (os.environ.get("JAX_PLATFORMS") != "cpu"
        and "ORBTPU_JAX_CACHE" not in os.environ):
    os.environ["ORBTPU_JAX_CACHE"] = "/tmp/orbtpu_xla_cache"


def _emit(record):
    print(json.dumps(record), flush=True)


def sanitize_session():
    """One tiny read: flips the runtime into truthful-blocking mode
    (module docstring of pipeline/device_loop.py).  Returns the read
    round-trip in ms."""
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jnp.zeros(()) + 1)
    return (time.perf_counter() - t0) * 1e3


def dispatch_probe(n: int = 64):
    """us/call of a tiny jitted op chain, dispatch + (truthful) block —
    sanity evidence that per-dispatch overhead is micro- not
    milliseconds in the timed regime."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    x = f(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n * 1e6


class SensorBench:
    """One sensor path: prepare (render+compile+warm) / run_timed /
    finalize (single readback) as separate phases so every timed region
    can run before any read poisons the session."""

    def __init__(self, sensor: str, n_warm: int = 16, n_bench: int = 96,
                 n_bench2: int = 96, n_bench3: int = 96):
        from orb_slam2_annotate_tpu.geometry import CameraModel
        from orb_slam2_annotate_tpu.io import synthetic
        from orb_slam2_annotate_tpu.pipeline import SlamConfig
        from orb_slam2_annotate_tpu.pipeline.device_loop import FreeRunner

        self.sensor = sensor
        if sensor != "mono":
            n_bench3 = 0  # scan segment benched on the headline sensor
        self.n_warm, self.n_bench = n_warm, n_bench
        self.n_bench2 = n_bench2  # segment B: pre-uploaded streaming
        self.n_bench3 = n_bench3  # segment C: chunked-scan batch mode
        n_frames = n_warm + n_bench + n_bench2 + n_bench3
        self.n_frames = n_frames
        baseline = 0.3
        self.cam = CameraModel.create(
            fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480,
            bf=(500.0 * baseline if sensor != "mono" else 0.0))
        scene = synthetic.PlaneScene(seed=1)
        # segment A (warm + headline): forward lateral sweep; segment B
        # (pre-uploaded): retrace backward over the mapped area — the
        # forward sweep extended past ~112 frames leaves the textured
        # walls, and steady-state tracking against an existing map is
        # exactly what B isolates
        base = n_warm + n_bench
        fwd = synthetic.orbit_trajectory(base, step=0.05)
        k, d, idx = base - 1, -1, []
        for _ in range(n_bench2 + n_bench3):  # bounce inside the mapped span
            k += d
            if k < 0:
                k, d = 1, 1
            idx.append(k)
        self.poses = fwd + [fwd[j] for j in idx]

        kw = {} if sensor == "mono" else dict(sensor=sensor, th_depth=100.0)
        # ablation knobs for tools/ab_mono_fps.py (subprocess A/B of the
        # r4 hot-path changes; defaults match production)
        kw["free_live_gba"] = os.environ.get(
            "ORBTPU_BENCH_LIVE_GBA", "1") != "0"
        kw["enable_loop_closing"] = os.environ.get(
            "ORBTPU_BENCH_LOOP", "1") != "0"
        cfg = SlamConfig(n_features=1024, max_kf=128, max_mp=16384,
                         max_frames_between_kf=6, init_min_matches=60, **kw)
        self.runner = FreeRunner(self.cam, cfg, max_frames=n_frames,
                                 auto_grow=False)

        # frames rendered up front (disk-cached), uint8 like a real camera
        key = "PlaneScene(seed=1,tex=768)"
        img, dep = synthetic.render_frames_cached(
            scene, self.cam, self.poses, 480, 640, key,
            with_depth=(sensor == "rgbd"))
        if sensor == "stereo":
            poses_r = [(R, np.asarray(t, np.float32)
                        - np.asarray([baseline, 0, 0], np.float32))
                       for R, t in self.poses]
            img_r, _ = synthetic.render_frames_cached(
                scene, self.cam, poses_r, 480, 640, key + "|right")
            self.frames = [(img[k], img_r[k]) for k in range(n_frames)]
        elif sensor == "rgbd":
            self.frames = [(img[k], dep[k]) for k in range(n_frames)]
        else:
            self.frames = [(img[k],) for k in range(n_frames)]
        self.total = None

    def _track(self, k):
        r = self.runner
        if self.sensor == "stereo":
            r.track_stereo(self.frames[k][0], self.frames[k][1], k / 30.0)
        elif self.sensor == "rgbd":
            r.track_rgbd(self.frames[k][0], self.frames[k][1], k / 30.0)
        else:
            r.track_mono(self.frames[k][0], k / 30.0)

    def prepare(self):
        """Compile + first-execute, then run the warmup segment (map
        bootstrap) and drain — zero reads."""
        self.runner.warmup()
        if self.n_bench3:
            self.runner.warmup_sequence(chunk=48)
        for k in range(self.n_warm):
            self._track(k)
        self.runner.block()

    def run_timed(self):
        """Segment A — the headline: dispatch the steady-state segment
        with per-frame H2D uploads in the loop (a camera stream), wait
        for the device to drain.  Zero device->host reads inside."""
        end_a = self.n_warm + self.n_bench
        t0 = time.perf_counter()
        for k in range(self.n_warm, end_a):
            self._track(k)
        self.runner.block()
        self.total = time.perf_counter() - t0
        return self.n_bench / self.total

    def run_timed_preuploaded(self):
        """Segment B: the SAME steady-state pipeline with the frames
        already device-resident, so the loop is dispatch-only.  The gap
        between A and B is the host/remote-link upload cost — on the
        axon tunnel that cost is link jitter, not chip throughput (H2D
        uploads do not poison; only D2H reads do)."""
        import jax.numpy as jnp

        start = self.n_warm + self.n_bench
        dev = [tuple(jnp.asarray(np.asarray(f)) for f in self.frames[k])
               for k in range(start, start + self.n_bench2)]
        self.runner.block()
        t0 = time.perf_counter()
        for k, fr in enumerate(dev):
            ts = (start + k) / 30.0
            if self.sensor == "stereo":
                self.runner.track_stereo(fr[0], fr[1], ts)
            elif self.sensor == "rgbd":
                self.runner.track_rgbd(fr[0], fr[1], ts)
            else:
                self.runner.track_mono(fr[0], ts)
        self.runner.block()
        self.total2 = time.perf_counter() - t0
        return self.n_bench2 / self.total2

    def run_timed_scan(self):
        """Segment C: batch mode — whole chunks per dispatch via
        lax.scan (track_mono_sequence).  Removes per-frame host/RPC work
        entirely; this is the device-bound throughput of the pipeline."""
        start = self.n_warm + self.n_bench + self.n_bench2
        imgs = np.stack([self.frames[k][0]
                         for k in range(start, self.n_frames)])
        ts = [k / 30.0 for k in range(start, self.n_frames)]
        self.runner.block()
        t0 = time.perf_counter()
        self.runner.track_mono_sequence(imgs, timestamps=ts, chunk=48)
        self.runner.block()
        self.total3 = time.perf_counter() - t0
        return self.n_bench3 / self.total3

    def finalize(self):
        """One-shot readback AFTER all timed regions: validity + ATE."""
        from orb_slam2_annotate_tpu.io import evaluation

        out = self.runner.finish(resolve_loops=False)
        tracked = [(k, T) for k, T in out["trajectory"] if T is not None]
        ok = (len(tracked) > 0.7 * self.n_frames and out["n_keyframes"] >= 3
              and int(out["modes"][-1]) == 2)
        fps = self.n_bench / self.total if self.total else 0.0
        fps2 = (self.n_bench2 / self.total2
                if getattr(self, "total2", None) else None)
        fps3 = (self.n_bench3 / self.total3
                if getattr(self, "total3", None) else None)
        if not ok:
            fps = 0.0
        est = np.stack([-T[:3, :3].T @ T[:3, 3] for _, T in tracked])
        gt = np.stack([-self.poses[k][0].T @ self.poses[k][1]
                       for k, _ in tracked])
        rmse, _ = evaluation.ate_rmse(est, gt,
                                      with_scale=(self.sensor == "mono"))
        print(f"bench[{self.sensor}]: tracked={len(tracked)}/{self.n_frames}"
              f" kfs={out['n_keyframes']} mps={out['n_mappoints']}"
              f" ate={rmse * 100:.2f}cm total={self.total:.3f}s",
              file=sys.stderr)
        row = dict(fps=round(fps, 2), ate_cm=round(float(rmse) * 100, 2),
                   tracked=len(tracked), n_frames=self.n_frames,
                   n_keyframes=out["n_keyframes"])
        if fps2 is not None:
            row["fps_preuploaded"] = round(fps2 if ok else 0.0, 2)
        if fps3 is not None:
            row["fps_scan"] = round(fps3 if ok else 0.0, 2)
        return row


class LongBench:
    """The 1248-frame multi-loop spiral (KITTI-00-shaped, reference
    README.md:130) at a FIXED capacity tier sized so the zero-read
    keyframe bound never forces mid-run growth — one compile, and the
    whole dispatch loop stays in one program.  Capacity-growth stress
    itself is exercised by tools/bench_long.py + the ring-stress
    artifact (LONGRUN_r05), not inside the bench budget."""

    def __init__(self, n_frames: int = 1248, block_every: int = 96):
        from orb_slam2_annotate_tpu.geometry import CameraModel
        from orb_slam2_annotate_tpu.io import synthetic
        from orb_slam2_annotate_tpu.pipeline import SlamConfig
        from orb_slam2_annotate_tpu.pipeline.device_loop import FreeRunner

        self.n_frames = n_frames
        self.block_every = block_every
        self.cam = CameraModel.create(fx=500.0, fy=500.0, cx=320.0,
                                      cy=240.0, width=640, height=480)
        scene = synthetic.RoomScene(seed=2, tex_size=1536)
        self.poses = synthetic.multi_loop_trajectory(n_frames, laps=3.1,
                                                     r0=1.5, dr=0.35)
        minf = 2
        K = 128 * ((2 + n_frames // minf + 2) // 128 + 1)  # bound < K
        cfg = SlamConfig(
            n_features=1024, n_levels=8, max_kf=K, max_mp=K * 128,
            max_frames_between_kf=6, min_frames_between_kf=minf,
            init_min_matches=60, enable_loop_closing=True, seed=0)
        self.K = K
        self.runner = FreeRunner(self.cam, cfg, max_frames=n_frames,
                                 auto_grow=False)
        self.frames, _ = synthetic.render_frames_cached(
            scene, self.cam, self.poses, 480, 640,
            "RoomScene(seed=2,tex=1536)", verbose=True)
        self.blocks = []
        self.frames_done = 0
        self.total = None

    def prepare(self):
        self.runner.warmup()

    def run_timed(self, budget_s: float = 240.0):
        """Dispatch with per-block drain timestamps; stop at the budget
        (at a block boundary) so the readback phase is always reached."""
        t0 = time.perf_counter()
        t_blk = t0
        for k in range(self.n_frames):
            self.runner.track_mono(self.frames[k], k / 30.0)
            if (k + 1) % self.block_every == 0 or k == self.n_frames - 1:
                self.runner.block()
                now = time.perf_counter()
                nb = (k + 1) - self.frames_done
                self.blocks.append(round(nb / (now - t_blk), 1))
                t_blk = now
                self.frames_done = k + 1
                print(f"bench_long: frame {k + 1}/{self.n_frames} "
                      f"block fps={self.blocks[-1]} K={self.K}",
                      file=sys.stderr)
                if now - t0 > budget_s and k + 1 < self.n_frames:
                    print(f"bench_long: budget {budget_s}s reached at "
                          f"frame {k + 1} — truncating", file=sys.stderr)
                    break
        self.total = time.perf_counter() - t0
        return self.frames_done / self.total

    def finalize(self):
        from orb_slam2_annotate_tpu.io import evaluation

        out = self.runner.finish(resolve_loops=False)
        n = self.frames_done
        tracked = [(k, T) for k, T in out["trajectory"][:n]
                   if T is not None]
        est = np.stack([-T[:3, :3].T @ T[:3, 3] for _, T in tracked])
        gt = np.stack([-self.poses[k][0].T @ self.poses[k][1]
                       for k, _ in tracked])
        ate, _ = evaluation.ate_rmse(est, gt, with_scale=True)
        m = out["map"]
        kf_fids = np.sort(np.asarray(m.kf_frame_id)[np.asarray(m.kf_valid)])
        thirds = [int(x) for x in np.searchsorted(
            kf_fids, [n // 3, 2 * n // 3, n])]
        return dict(
            frames=n, frames_planned=self.n_frames,
            fps=round(n / self.total, 1), block_fps=self.blocks,
            tracked=len(tracked), ate_cm=round(float(ate) * 100, 2),
            n_keyframes=out["n_keyframes"], n_mappoints=out["n_mappoints"],
            n_loops=out["n_loops_closed"], n_gba=out["n_gba"],
            n_resets=out["n_resets"],
            n_kf_skipped_full=out["n_kf_skipped_full"],
            kf_per_third=[thirds[0], thirds[1] - thirds[0],
                          thirds[2] - thirds[1]],
            closure_frames=[int(f) for f in out["closure_records"][:, 0]],
            max_kf_tier=self.K,
        )


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sensor", default="mono",
                    choices=["mono", "stereo", "rgbd"])
    ap.add_argument("--skip-extras", action="store_true",
                    help="headline metric only (no depth-sensor rows, "
                         "no long run)")
    ap.add_argument("--long-frames", type=int, default=1248)
    ap.add_argument("--long-budget", type=float, default=float(
        os.environ.get("ORBTPU_LONG_BUDGET_S", 180.0)))
    args = ap.parse_args()

    import jax
    platform = jax.devices()[0].platform
    read_rtt_ms = sanitize_session()  # truthful blocking from here on

    if args.sensor != "mono":
        b = SensorBench(args.sensor)
        b.prepare()
        fps = b.run_timed()
        b.run_timed_preuploaded()
        row = b.finalize()
        _emit({"metric": f"synthetic_{args.sensor}_tracking_fps",
               "value": row["fps"], "unit": "frames/sec/chip",
               "vs_baseline": round(row["fps"] / BASELINE_FPS, 3),
               args.sensor: row, "platform": platform})
        return 0

    extras = not args.skip_extras
    t_all = time.perf_counter()

    # ---- probes --------------------------------------------------------
    dispatch_us = dispatch_probe()
    print(f"bench: dispatch probe {dispatch_us:.0f} us/dispatch, "
          f"read RTT {read_rtt_ms:.1f} ms", file=sys.stderr)

    # ---- mono: prepare -> timed A/B/C -> one readback -> HEADLINE ------
    mono = SensorBench("mono")
    mono.prepare()
    mono_fps = mono.run_timed()
    mono_fps2 = mono.run_timed_preuploaded()
    mono_fps3 = mono.run_timed_scan()
    row = mono.finalize()
    record = {
        "metric": "synthetic_mono_tracking_fps",
        "value": row["fps"],
        "unit": "frames/sec/chip",
        "vs_baseline": round(row["fps"] / BASELINE_FPS, 3),
        "dispatch_us": round(dispatch_us, 1),
        "read_rtt_ms": round(read_rtt_ms, 1),
        "timing": "dispatch+block, session sanitized (truthful block)",
        "platform": platform,
        "mono": row,
    }
    _emit(record)  # headline immediately after the mono segment

    if extras:
        record["sensors"] = {}
        for sname in ("stereo", "rgbd"):
            try:
                b = SensorBench(sname)
                b.prepare()
                b.run_timed()
                b.run_timed_preuploaded()
                record["sensors"][sname] = b.finalize()
                del b
            except Exception as e:
                print(f"bench: {sname} failed: {e!r}", file=sys.stderr)
            _emit(record)
        try:
            long_b = LongBench(n_frames=args.long_frames)
            long_b.prepare()
            long_b.run_timed(budget_s=args.long_budget)
            record["long_run"] = long_b.finalize()
        except Exception as e:
            print(f"bench: long run failed: {e!r}", file=sys.stderr)
        record["wall_s"] = round(time.perf_counter() - t_all, 1)
        _emit(record)  # complete artifact (last line is authoritative)
    return 0


if __name__ == "__main__":
    sys.exit(main())
