"""Round-5 true-cost diagnostics (run on the real TPU, one process).

Answers, with read-verified (sanitized-session) timing:
 1. Is the streaming path host-dispatch-bound or device-execution-bound?
    (time the dispatch loop and the final block SEPARATELY)
 2. Why is chunked-scan batch mode slow? (time chunk 1 vs chunk 2 —
    a compile shows up as a one-off; a per-iteration copy shows up in
    both)
 3. Per-frame latency distribution (block every frame): KF-chain frames
    vs tracking-only frames.
 4. Keyframe-chain internals at the bench operating point: LBA cost vs
    iteration count (slope = per-linearization cost), triangulation,
    culling, stats.

Usage:  python tools/exp_true_cost.py          # real TPU
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp
    from bench import SensorBench, sanitize_session, dispatch_probe

    out = {}
    out["read_rtt_ms"] = round(sanitize_session(), 1)
    out["dispatch_us_tiny"] = round(dispatch_probe(), 1)
    print("sanitized:", out, file=sys.stderr)

    b = SensorBench("mono")
    b.prepare()

    # ---- 1. dispatch loop vs block split --------------------------------
    end_a = b.n_warm + b.n_bench
    t0 = time.perf_counter()
    for k in range(b.n_warm, end_a):
        b._track(k)
    t_loop = time.perf_counter() - t0
    t1 = time.perf_counter()
    b.runner.block()
    t_block = time.perf_counter() - t1
    out["stream_dispatch_loop_s"] = round(t_loop, 3)
    out["stream_block_s"] = round(t_block, 3)
    out["stream_fps"] = round(b.n_bench / (t_loop + t_block), 2)
    print(f"stream: loop={t_loop:.3f}s block={t_block:.3f}s "
          f"-> {out['stream_fps']} fps", file=sys.stderr)

    # ---- 2. scan chunks, timed individually -----------------------------
    start = end_a
    imgs = np.stack([b.frames[k][0] for k in range(start, start + 96)])
    ts = [k / 30.0 for k in range(start, start + 96)]
    b.runner.block()
    tc = []
    for c in range(2):
        t0 = time.perf_counter()
        b.runner.track_mono_sequence(imgs[c * 48:(c + 1) * 48],
                                     timestamps=ts[c * 48:(c + 1) * 48],
                                     chunk=48)
        b.runner.block()
        tc.append(round(time.perf_counter() - t0, 3))
    out["scan_chunk_s"] = tc
    print(f"scan chunks: {tc}", file=sys.stderr)

    # ---- 3. per-frame latency (block every frame) -----------------------
    lat = []
    for k in range(start + 96, start + 96 + 48):
        t0 = time.perf_counter()
        b._track(k)
        b.runner.block()
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    out["per_frame_ms"] = dict(
        p10=round(float(np.percentile(lat, 10)), 2),
        p50=round(float(np.percentile(lat, 50)), 2),
        p90=round(float(np.percentile(lat, 90)), 2),
        mean=round(float(lat.mean()), 2))
    print("per-frame ms:", out["per_frame_ms"], file=sys.stderr)

    # ---- 4. chain internals on the live map -----------------------------
    # (reads below are fine: all timed regions above are done)
    from orb_slam2_annotate_tpu.pipeline import local_mapping as lm
    from orb_slam2_annotate_tpu.solvers import ba_core
    from orb_slam2_annotate_tpu.worldmap import map_state as ms

    st = b.runner.state
    m = jax.tree.map(lambda x: x, st.m)
    slot = jnp.asarray(int(np.asarray(st.ref_kf)), jnp.int32)
    cam = b.runner.cam

    def timeit(fn, n=8, warmup=2):
        for _ in range(warmup):
            jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn()
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / n * 1e3

    # full chain
    fr_img = jnp.asarray(b.frames[0][0])
    from orb_slam2_annotate_tpu.pipeline.frame import make_frame_mono
    fr = make_frame_mono(fr_img, cam, b.runner.cfg.extractor)
    jax.block_until_ready(fr.desc)

    out["extract_ms"] = round(timeit(
        lambda: make_frame_mono(fr_img, cam, b.runner.cfg.extractor).desc), 2)

    def build_prob():
        # replicate local_bundle_adjustment's problem construction once
        return lm.local_bundle_adjustment(
            jax.tree.map(jnp.copy, m), cam, slot, update_stats=False).map.kf_R

    out["lba_full_ms"] = round(timeit(build_prob, n=6), 2)

    out["create_mappoints_ms"] = round(timeit(
        lambda: lm.create_new_mappoints(
            m, cam, slot, update_stats=False).mp_pos, n=6), 2)
    out["cull_ms"] = round(timeit(
        lambda: lm.cull_keyframes(m, slot, update_stats=False)[1].slots,
        n=6), 2)
    out["stats_touched_ms"] = round(timeit(
        lambda: ms.update_mappoint_stats(m).mp_desc, n=6), 2)
    out["covis_ms"] = round(timeit(lambda: ms.covisibility(m), n=6), 2)

    # LBA iteration slope via a standalone grid problem at the same shapes
    K, P, N = m.K, m.P, m.N
    from orb_slam2_annotate_tpu.pipeline.local_mapping import _inv_sigma2
    W = ms.covisibility(m)
    w_slot = jnp.where(m.kf_valid, W[slot], -1).at[slot].set(-1)
    _, nb = jax.lax.top_k(w_slot, 15)
    opt_kfs = jnp.concatenate([jnp.asarray([slot]), nb])
    O = ms.observation_matrix(m)
    opt_rows = O[opt_kfs]
    pts_mask = jnp.any(opt_rows, axis=0) & m.mp_valid
    _, psel = jax.lax.top_k(pts_mask.astype(jnp.int32), min(2048, P))
    g2l = jnp.full((P,), -1, jnp.int32).at[psel].set(
        jnp.arange(min(2048, P), dtype=jnp.int32))
    cams_all = jnp.concatenate([opt_kfs, opt_kfs])  # 32 cams like LBA
    obs_grid = m.kf_obs[cams_all]
    feat_ok = m.kf_feat_valid[cams_all]
    pt_loc = jnp.where(feat_ok & (obs_grid >= 0),
                       g2l[jnp.clip(obs_grid, 0)], -1)
    prob = ba_core.GridBA(
        R=m.kf_R[cams_all], t=m.kf_t[cams_all], points=m.mp_pos[psel],
        cam_fixed=jnp.zeros((32,), bool).at[0].set(True),
        cam_valid=jnp.ones((32,), bool), pt_valid=pts_mask[psel],
        pt_loc=pt_loc.astype(jnp.int32), uv=m.kf_xy[cams_all],
        ur=m.kf_ur[cams_all], inv_sigma2=_inv_sigma2(m.kf_octave[cams_all]),
        edge_valid=feat_ok & (pt_loc >= 0))

    for it in (1, 2, 4, 8):
        out[f"grid_ba_{it}it_ms"] = round(timeit(
            lambda it=it: ba_core.bundle_adjust_grid(
                cam, prob, iters=it, robust=True)[0], n=6), 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
