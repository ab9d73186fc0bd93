"""A/B the round-4 hot-path changes on the real chip (VERDICT r4 item 4:
mono headline regressed 1030 -> ~744 -> 455 fps with four candidate
costs added in round 4 and no measurement attributing the loss).

Each variant runs `bench.py --skip-extras` in a FRESH subprocess (its
own TPU session — no cross-variant poison, and the env knobs in
pipeline/tracking.py / bench.py are read at import).  Variants:

  r4-full        production defaults (all four changes on)
  no-live-gba    free_live_gba=False (drop the in-program global-BA arm)
  no-loop        enable_loop_closing=False too (r2-shaped lean program)
  no-retry       widen-retry off (single motion-model search)
  cap-2048       max_local_pts 4096 -> 2048 (halve the local matcher)
  gamma-0.8      velocity damping back on
  r3-config      no-retry + cap-2048 + gamma-0.8 (live-GBA still on)
  lean           everything off (floor: what r3 approximately measured)

Writes tools/AB_MONO_r05.json and prints a table.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = [
    ("r4-full", {}),
    ("no-live-gba", {"ORBTPU_BENCH_LIVE_GBA": "0"}),
    ("no-loop", {"ORBTPU_BENCH_LIVE_GBA": "0", "ORBTPU_BENCH_LOOP": "0"}),
    ("no-retry", {"ORBTPU_WIDEN_RETRY": "0"}),
    ("cap-2048", {"ORBTPU_MAX_LOCAL_PTS": "2048"}),
    ("gamma-0.8", {"ORBTPU_GAMMA_VEL": "0.8"}),
    ("r3-config", {"ORBTPU_WIDEN_RETRY": "0", "ORBTPU_MAX_LOCAL_PTS": "2048",
                   "ORBTPU_GAMMA_VEL": "0.8"}),
    ("lean", {"ORBTPU_WIDEN_RETRY": "0", "ORBTPU_MAX_LOCAL_PTS": "2048",
              "ORBTPU_GAMMA_VEL": "0.8", "ORBTPU_BENCH_LIVE_GBA": "0",
              "ORBTPU_BENCH_LOOP": "0"}),
]


def run_variant(name, env_over, reps):
    rows = []
    for rep in range(reps):
        env = dict(os.environ)
        env.update(env_over)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--skip-extras"],
                capture_output=True, text=True, timeout=900, env=env,
                cwd=REPO)
        except subprocess.TimeoutExpired:
            print(f"{name} rep{rep}: TIMEOUT", flush=True)
            rows.append(None)
            continue
        last = None
        for line in r.stdout.splitlines():
            try:
                last = json.loads(line)
            except Exception:
                pass
        if last is None:
            print(f"{name} rep{rep}: no JSON (rc={r.returncode})\n"
                  f"{r.stderr[-800:]}", flush=True)
            rows.append(None)
            continue
        row = dict(fps=last.get("mono", {}).get("fps", last["value"]),
                   ate_cm=last.get("mono", {}).get("ate_cm"),
                   dispatch_us=last.get("dispatch_us"),
                   wall_s=round(time.time() - t0, 1))
        print(f"{name} rep{rep}: {row}", flush=True)
        rows.append(row)
    return rows


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    out = {}
    for name, env_over in VARIANTS:
        if args.only and name not in args.only:
            continue
        out[name] = dict(env=env_over,
                         reps=run_variant(name, env_over, args.reps))
        with open(os.path.join(REPO, "tools", "AB_MONO_r05.json"),
                  "w") as f:
            json.dump(out, f, indent=1)

    print("\n== summary (best-rep fps) ==")
    for name, rec in out.items():
        reps = [r for r in rec["reps"] if r]
        if not reps:
            print(f"{name:12s}  FAILED")
            continue
        best = max(r["fps"] for r in reps)
        ates = {r["ate_cm"] for r in reps}
        print(f"{name:12s}  fps {[r['fps'] for r in reps]}  best={best}"
              f"  ate={sorted(ates)}")


if __name__ == "__main__":
    main()
