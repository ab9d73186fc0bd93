"""Free-running SLAM: the ENTIRE per-frame state machine as one device
program, with ZERO device->host reads for the lifetime of a sequence.

Why this exists — the axon remote-TPU runtime runs a record-replay
speculator: as long as the host only *dispatches* (and uploads H2D),
each jitted call costs ~50 us.  The FIRST device->host transfer of any
kind (np.asarray, float(), device_get, even an async copy_to_host)
permanently degrades the session to a ~25 ms-per-dispatch floor
(measured, tools/exp_* + round-3 characterization).  The r2 pipeline
read a small stats bundle every frame, so the whole run sat on that
floor (~28 fps).  The fix is architectural: keep EVERY per-frame
decision on device —

  * the tracking state machine (init -> OK -> LOST -> reloc) is a
    device scalar, branched with lax.cond,
  * the keyframe policy (NeedNewKeyFrame, Tracking.cc:1075) is computed
    from device counters and gates the whole mapping chain with a cond,
  * trajectory records (Tcr + reference-KF slot, Tracking.cc:514-544)
    are written into a device-side ring,
  * keyframe culling's record re-referencing (System.cc:366-371) is a
    masked rewrite of that ring inside the same program,

and the host reads results exactly ONCE, after the last frame
(`FreeRunner.finish()`).  Loop closing runs LIVE on device too
(loop_closing.free_loop_stage: detection, consistency streaks, the
full ComputeSim3 funnel, drift gate, essential-graph correction and
seam fusion, all under lax.cond inside the keyframe branch); the
post-closure global BA refinement runs once at finish(), like the
reference's asynchronous GBA (LoopClosing.cc:756).

The synchronous System (system.py) remains the reference-semantics
path (live loop closing, capacity growth, host-visible telemetry); this
module is the production throughput path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import lie
from ..geometry.camera import CameraModel, undistort_pixels
from ..ops import matching, orb
from ..ops.extractor import extract
from ..solvers import initializer
from ..worldmap import map_state as ms
from ..worldmap import vocabulary as voc
from . import local_mapping as lm
from . import tracking as tk
from .frame import (Frame, _make_frame_mono, _make_frame_rgbd,
                    _make_frame_stereo)
from .system import SlamConfig

from .loop_closing import MAX_LOOP_EDGES as MAX_LOOPS

# tracker modes (device scalar)
MODE_FIRST = 0      # waiting for a usable init frame
MODE_SECOND = 1     # mono: have init frame, matching against it
MODE_OK = 2
MODE_LOST = 3


class FreeState(NamedTuple):
    """Everything the per-frame program needs, resident on device."""
    m: ms.MapState
    bows: jnp.ndarray        # [K, W] keyframe BoW rows (reloc + loop replay)
    # tracker scalars
    R: jnp.ndarray           # [3,3] current Tcw
    t: jnp.ndarray           # [3]
    vel_R: jnp.ndarray
    vel_t: jnp.ndarray
    has_vel: jnp.ndarray     # bool
    mode: jnp.ndarray        # i32
    ref_kf: jnp.ndarray      # i32
    last_kf_frame: jnp.ndarray  # i32
    peak_n_local: jnp.ndarray   # i32
    # previous frame
    last: Frame
    last_obs: jnp.ndarray    # [N] i32
    # stashed mono-init frame
    init_f: Frame
    init_fid: jnp.ndarray    # i32
    init_ts: jnp.ndarray     # f32
    # live loop-closing state (device-side funnel, free_loop_stage)
    streaks: jnp.ndarray     # [K] i32 candidate consistency streaks
    loop_edge_a: jnp.ndarray  # [MAX_LOOPS] i32 historic loop edges
    loop_edge_b: jnp.ndarray  # [MAX_LOOPS] i32
    loop_edge_ok: jnp.ndarray  # [MAX_LOOPS] bool
    n_loops: jnp.ndarray     # i32 closures so far
    last_loop_nkf: jnp.ndarray  # i32 map.n_kf at the last closure
    # per-frame rings (read once at finish)
    traj: jnp.ndarray        # [F, 12] packed Tcr
    traj_ref: jnp.ndarray    # [F] i32 reference keyframe slot
    traj_ok: jnp.ndarray     # [F] bool
    ring_mode: jnp.ndarray   # [F] i32 tracker mode after the frame
    ring_nlocal: jnp.ndarray  # [F] i32 inliers (diagnostics)
    ring_loop: jnp.ndarray   # [F, 8] f32 loop-funnel diag (free_loop_stage)


def _empty_frame(n: int) -> Frame:
    return Frame(
        xy=jnp.zeros((n, 2)), xy_raw=jnp.zeros((n, 2)),
        ur=jnp.full((n,), -1.0), depth=jnp.zeros((n,)),
        octave=jnp.zeros((n,), jnp.int32), angle=jnp.zeros((n,)),
        response=jnp.zeros((n,)), desc=jnp.zeros((n, orb.DESC_WORDS), jnp.uint32),
        valid=jnp.zeros((n,), bool),
    )


def init_state(cfg: SlamConfig, n_words: int, max_frames: int) -> FreeState:
    n = cfg.n_features
    return FreeState(
        m=ms.empty_map(cfg.max_kf, cfg.max_mp, n),
        bows=jnp.zeros((cfg.max_kf, n_words), jnp.float32),
        R=jnp.eye(3), t=jnp.zeros(3),
        vel_R=jnp.eye(3), vel_t=jnp.zeros(3),
        has_vel=jnp.asarray(False),
        mode=jnp.asarray(MODE_FIRST, jnp.int32),
        ref_kf=jnp.asarray(0, jnp.int32),
        last_kf_frame=jnp.asarray(-999, jnp.int32),
        peak_n_local=jnp.asarray(0, jnp.int32),
        last=_empty_frame(n),
        last_obs=jnp.full((n,), -1, jnp.int32),
        init_f=_empty_frame(n),
        init_fid=jnp.asarray(-1, jnp.int32),
        init_ts=jnp.asarray(0.0),
        streaks=jnp.zeros((cfg.max_kf,), jnp.int32),
        loop_edge_a=jnp.zeros((MAX_LOOPS,), jnp.int32),
        loop_edge_b=jnp.zeros((MAX_LOOPS,), jnp.int32),
        loop_edge_ok=jnp.zeros((MAX_LOOPS,), bool),
        n_loops=jnp.asarray(0, jnp.int32),
        last_loop_nkf=jnp.asarray(0, jnp.int32),
        traj=jnp.zeros((max_frames, 12)),
        traj_ref=jnp.zeros((max_frames,), jnp.int32),
        traj_ok=jnp.zeros((max_frames,), bool),
        ring_mode=jnp.zeros((max_frames,), jnp.int32),
        ring_nlocal=jnp.zeros((max_frames,), jnp.int32),
        ring_loop=jnp.zeros((max_frames, 8), jnp.float32),
    )


def make_step(cfg: SlamConfig):
    """Build the jitted free-running step for a fixed config.

    Only plain-Python config scalars are captured (they become compile-
    time literals); every device value — camera, ORB tables, vocabulary,
    state, image — is a jit ARGUMENT (axon: captured device arrays
    poison the session, see module docstring).
    """
    ecfg = cfg.extractor
    N = cfg.n_features
    has_depth = cfg.sensor in ("stereo", "rgbd")
    MIN_TRACK = cfg.min_inliers_track
    MIN_LOCAL = cfg.min_inliers_local
    MINF = cfg.min_frames_between_kf
    MAXF = cfg.max_frames_between_kf
    KF_RATIO = cfg.kf_ref_ratio
    INIT_MIN = cfg.init_min_matches
    TH_DEPTH = cfg.th_depth
    EN_CULL = cfg.enable_cull
    EN_FUSE = cfg.enable_fuse
    EN_LBA = cfg.enable_local_ba
    EN_KFCULL = cfg.enable_kf_culling
    EN_LOOP = cfg.enable_loop_closing
    SEED = cfg.seed
    from .loop_closing import LoopCloserConfig, free_loop_stage
    LCFG = LoopCloserConfig(fix_scale=cfg.sensor != "mono")

    def write_rec(st, frame_id, ref, Rcr, tcr, ok, mode, n_local):
        i = frame_id
        rec = jnp.concatenate([Rcr.reshape(9), tcr.reshape(3)])
        return st._replace(
            traj=st.traj.at[i].set(rec),
            traj_ref=st.traj_ref.at[i].set(ref),
            traj_ok=st.traj_ok.at[i].set(ok),
            ring_mode=st.ring_mode.at[i].set(mode),
            ring_nlocal=st.ring_nlocal.at[i].set(n_local),
        )

    # ---------------- keyframe chain (cond branch) --------------------

    def run_chain(cam, vocab, st: FreeState, frame: Frame,
                  frame_id, ts, n_local):
        baseline = jnp.where(has_depth, cam.bf / cam.fx, 0.0)
        m, slot, cull = lm.keyframe_chain(
            st.m, cam, frame, st.R, st.t, st.last_obs, frame_id, ts,
            TH_DEPTH * baseline,
            has_depth=has_depth, do_cull_recent=EN_CULL,
            stats_in_triangulate=EN_FUSE, do_fuse=EN_FUSE,
            do_local_ba=EN_LBA, do_kf_cull=EN_KFCULL,
        )
        # --- re-reference ring records whose reference KF was culled
        # (System.cc:366-371 walks the spanning tree at save time; here
        # the ring is rewritten in place from the relative transforms the
        # cull kernel computed)
        traj, traj_ref = st.traj, st.traj_ref
        Rcr_all = traj[:, :9].reshape(-1, 3, 3)
        tcr_all = traj[:, 9:12]
        for i in range(cull.slots.shape[0]):  # static, max_cull=4
            hit = st.traj_ok & cull.ok[i] & (traj_ref == cull.slots[i])
            t_new = jnp.einsum("fij,j->fi", Rcr_all, cull.t_rel[i]) + tcr_all
            R_new = Rcr_all @ cull.R_rel[i]
            Rcr_all = jnp.where(hit[:, None, None], R_new, Rcr_all)
            tcr_all = jnp.where(hit[:, None], t_new, tcr_all)
            traj_ref = jnp.where(hit, cull.new_ref[i], traj_ref)
        traj = jnp.concatenate([Rcr_all.reshape(-1, 9), tcr_all], axis=1)

        # live loop closing: the ENTIRE detect -> verify -> correct
        # pipeline runs device-side (free_loop_stage); it also writes
        # this keyframe's BoW row into the database
        if EN_LOOP:
            key = jax.random.fold_in(jax.random.PRNGKey(SEED + 13),
                                     frame_id)
            (m, bows, streaks, la, lb, lk, n_loops, last_nkf,
             closed, ldiag) = free_loop_stage(
                LCFG, cam, vocab, m, st.bows, slot, st.streaks,
                st.loop_edge_a, st.loop_edge_b, st.loop_edge_ok,
                st.n_loops, st.last_loop_nkf, key)
            # a closure moved every keyframe/point into the corrected
            # frame — the tracker MUST re-anchor there or the next
            # frames project the moved map from the drifted pose and go
            # LOST (the sync System adopts the corrected pose the same
            # way, system.py 'adopt possibly-updated pose').  Velocity
            # resets: the constant-velocity prior spans the correction.
            st = st._replace(
                streaks=streaks, loop_edge_a=la,
                loop_edge_b=lb, loop_edge_ok=lk,
                n_loops=n_loops, last_loop_nkf=last_nkf,
                R=jnp.where(closed, m.kf_R[slot], st.R),
                t=jnp.where(closed, m.kf_t[slot], st.t),
                has_vel=st.has_vel & ~closed,
                ring_loop=st.ring_loop.at[frame_id].set(ldiag))
        else:
            bow = voc.bow_vector(vocab, m.kf_desc[slot],
                                 m.kf_feat_valid[slot])
            bows = st.bows.at[slot].set(bow)

        # NOTE: the tracker adopts the chain's OBSERVATION row (the
        # fresh keyframe's post-BA/triangulation associations — without
        # them the motion-model search starves on fresh scenery and the
        # RoomScene circle loses tracking mid-run) but deliberately NOT
        # the BA-adjusted POSE: measured on the VGA bench orbit, pose
        # adoption DOUBLES final ATE (5.2 vs 2.6 cm).  The BA shift
        # breaks velocity continuity — the constant-velocity prediction
        # is built from pre-BA poses, and mixing frames from the two
        # pose streams injects a prediction error at every keyframe.
        # The map still carries the BA-corrected keyframe; the trajectory
        # record for this frame is Tcr=identity vs the corrected KF, so
        # the saved trajectory benefits either way (Tracking.cc keeps
        # tracking from mCurrentFrame's own pose too).
        return st._replace(
            m=m, bows=bows, traj=traj, traj_ref=traj_ref,
            last_obs=m.kf_obs[slot],
            ref_kf=slot.astype(jnp.int32),
            last_kf_frame=frame_id.astype(jnp.int32),
            peak_n_local=jnp.asarray(0, jnp.int32),
        )

    # ---------------- tracking branch (mode OK / LOST) ----------------

    def run_reloc(cam, vocab, st: FreeState, frame: Frame, frame_id):
        """Batched relocalization; returns (success, R, t, obs, ref)."""
        key = jax.random.fold_in(jax.random.PRNGKey(SEED + 7), frame_id)
        cand = tk.relocalize_candidates(cam, st.m, frame, vocab, st.bows, key)
        res = tk.track_local_map(cam, st.m, frame, cand.R, cand.t, cand.obs)
        ok = (cand.best_slot >= 0) & (res.n_inliers >= 50)
        return ok, res.R, res.t, res.obs, jnp.clip(cand.best_slot, 0), res

    def track_branch(cam, tab, vocab, st: FreeState, frame, frame_id, ts):
        was_ok = st.mode == MODE_OK
        step = tk.track_frame(
            cam, st.m, frame, st.last, st.last_obs,
            st.R, st.t, st.vel_R, st.vel_t,
            st.has_vel & was_ok, st.ref_kf,
        )
        n_pre = step.stats[0]
        n_local = step.stats[1]
        track_ok = was_ok & (n_pre >= MIN_TRACK) & (n_local >= MIN_LOCAL)

        # relocalize when tracking failed or we were already LOST
        need_reloc = ~track_ok & (st.m.n_kf >= 2)

        def do_reloc(_):
            return run_reloc(cam, vocab, st, frame, frame_id)

        def no_reloc(_):
            zf = tk.LocalMapTrack(
                R=jnp.eye(3), t=jnp.zeros(3),
                obs=jnp.full((N,), -1, jnp.int32),
                n_inliers=jnp.asarray(0, jnp.int32),
                n_local_kf=jnp.asarray(0, jnp.int32),
                mp_visible=st.m.mp_visible, mp_found=st.m.mp_found)
            return (jnp.asarray(False), jnp.eye(3), jnp.zeros(3),
                    jnp.full((N,), -1, jnp.int32),
                    jnp.asarray(0, jnp.int32), zf)

        r_ok, r_R, r_t, r_obs, r_ref, r_res = jax.lax.cond(
            need_reloc, do_reloc, no_reloc, None)

        ok = track_ok | r_ok
        R = jnp.where(track_ok, step.R, r_R)
        t = jnp.where(track_ok, step.t, r_t)
        obs = jnp.where(track_ok, step.obs, r_obs)
        ref = jnp.where(track_ok, st.ref_kf, r_ref).astype(jnp.int32)
        n_loc = jnp.where(track_ok, n_local, r_res.n_inliers)

        # visible/found counters from whichever path ran
        mp_visible = jnp.where(track_ok, step.mp_visible,
                               jnp.where(r_ok, r_res.mp_visible,
                                         st.m.mp_visible))
        mp_found = jnp.where(track_ok, step.mp_found,
                             jnp.where(r_ok, r_res.mp_found, st.m.mp_found))
        m = st.m._replace(mp_visible=mp_visible, mp_found=mp_found)

        # velocity: damped (track path) / reset (reloc or lost)
        vel_R = jnp.where(track_ok, step.poses[1, :9].reshape(3, 3),
                          jnp.eye(3))
        vel_t = jnp.where(track_ok, step.poses[1, 9:12], jnp.zeros(3))

        peak = jnp.where(ok, jnp.maximum(st.peak_n_local, n_loc),
                         st.peak_n_local)
        mode = jnp.where(ok, MODE_OK, MODE_LOST).astype(jnp.int32)

        st2 = st._replace(
            m=m, R=R, t=t, vel_R=vel_R, vel_t=vel_t,
            has_vel=track_ok, mode=mode, ref_kf=ref,
            peak_n_local=peak, last=frame, last_obs=obs,
        )

        # ---- keyframe policy (NeedNewKeyFrame, Tracking.cc:1075)
        since = frame_id - st2.last_kf_frame
        c1 = since >= MAXF
        c2 = n_loc < KF_RATIO * jnp.maximum(peak, 1)
        free_slot = jnp.any(~st2.m.kf_valid)
        need_kf = (ok & (since >= MINF) & (c1 | c2)
                   & (n_loc > MIN_TRACK) & free_slot)

        st3 = jax.lax.cond(
            need_kf,
            lambda s: run_chain(cam, vocab, s, frame, frame_id, ts, n_loc),
            lambda s: s,
            st2,
        )

        # ---- trajectory record.  After a keyframe this frame IS the
        # reference (identity Tcr); after reloc Tcr is vs the reloc ref;
        # otherwise the fused step's Tcr (poses[2]) vs the old ref.
        Rr = st3.m.kf_R[st3.ref_kf]
        tr = st3.m.kf_t[st3.ref_kf]
        Rcr_dyn = R @ Rr.T
        tcr_dyn = t - Rcr_dyn @ tr
        is_kf = need_kf
        Rcr = jnp.where(is_kf, jnp.eye(3), Rcr_dyn)
        tcr = jnp.where(is_kf, jnp.zeros(3), tcr_dyn)
        return write_rec(st3, frame_id, st3.ref_kf, Rcr, tcr, ok,
                         st3.mode, n_loc)

    # ---------------- initialization branch ---------------------------

    def init_branch_mono(cam, tab, vocab, st: FreeState, frame,
                         frame_id, ts):
        n_feat = jnp.sum(frame.valid)
        usable = n_feat >= INIT_MIN

        def try_init(st: FreeState):
            f0 = st.init_f
            res = matching.search_for_initialization(f0, frame, window=100.0)
            key = jax.random.fold_in(jax.random.PRNGKey(SEED), frame_id)
            x2 = frame.xy[jnp.clip(res.idx, 0)]
            # 512 hypotheses (vs the sync path's 200): a batch axis is
            # nearly free on the MXU and the free-running path cannot
            # retry interactively, so buy success probability upfront
            init = initializer.initialize_two_view(
                key, f0.xy, x2, res.matched, 512, 1.0, cam.K,
                min_parallax_deg=2.5,
            )
            enough = res.count >= INIT_MIN
            succ = init.success & enough

            def build(st: FreeState):
                good = init.good
                X = init.points
                z = jnp.where(good & (X[:, 2] > 0), X[:, 2], jnp.nan)
                med = jnp.nan_to_num(jnp.nanmedian(z), nan=1.0)
                med = jnp.where(med > 1e-6, med, 1.0)
                X = X / med
                t1 = init.t / med

                # map point p = init feature index n (P >= N)
                mp_ids = jnp.arange(N, dtype=jnp.int32)
                obs0 = jnp.where(good, mp_ids, -1)
                obs1 = jnp.full((N,), -1, jnp.int32).at[
                    jnp.clip(res.idx, 0)].max(jnp.where(good, mp_ids, -1))

                m = st.m
                m = ms.insert_keyframe(
                    m, jnp.asarray(0), jnp.eye(3), jnp.zeros(3),
                    st.init_fid, st.init_ts,
                    f0.xy, f0.ur, f0.depth, f0.octave, f0.angle,
                    f0.desc, f0.valid, obs0)
                m = ms.insert_keyframe(
                    m, jnp.asarray(1), init.R, t1, frame_id, ts,
                    frame.xy, frame.ur, frame.depth, frame.octave,
                    frame.angle, frame.desc, frame.valid, obs1)
                P = m.P
                mp_valid = jnp.zeros((P,), bool).at[mp_ids].set(good)
                mp_pos = jnp.zeros((P, 3)).at[mp_ids].set(
                    jnp.where(good[:, None], X, 0.0))
                m = m._replace(
                    mp_pos=mp_pos, mp_valid=mp_valid,
                    mp_first_kf=jnp.where(mp_valid, 0, m.mp_first_kf),
                )
                m = ms.update_mappoint_stats(m)
                out = lm.local_bundle_adjustment(m, cam, jnp.asarray(1),
                                                 update_stats=True)
                m = out.map

                bows = st.bows
                for s in (0, 1):
                    bows = bows.at[s].set(voc.bow_vector(
                        vocab, m.kf_desc[s], m.kf_feat_valid[s]))

                st2 = st._replace(
                    m=m, bows=bows,
                    R=m.kf_R[1], t=m.kf_t[1],
                    has_vel=jnp.asarray(False),
                    mode=jnp.asarray(MODE_OK, jnp.int32),
                    ref_kf=jnp.asarray(1, jnp.int32),
                    last_kf_frame=frame_id.astype(jnp.int32),
                    peak_n_local=jnp.asarray(0, jnp.int32),
                    last=frame, last_obs=obs1,
                )
                return write_rec(st2, frame_id, jnp.asarray(1, jnp.int32),
                                 jnp.eye(3), jnp.zeros(3),
                                 jnp.asarray(True), st2.mode,
                                 init.n_good.astype(jnp.int32))

            def restash(st: FreeState):
                # Geometric failure (low parallax / bad model) with the
                # match count still healthy: KEEP the stashed frame so
                # baseline accumulates over subsequent frames (the sync
                # path keeps _init_frame, system.py:_initialize_mono).
                # Match starvation: restart from the current frame
                # (Tracking.cc:632-638 deletes the Initializer).  A
                # TRANSIENT dip below the entry gate with triangulation
                # still progressing keeps the stash too — the free-
                # running path cannot re-try interactively and a restash
                # resets the accumulated baseline to zero.
                keep = enough | (init.n_good >= 40)
                st2 = st._replace(
                    init_f=jax.tree.map(
                        lambda a, b: jnp.where(
                            jnp.reshape(keep, (1,) * a.ndim), a, b),
                        st.init_f, frame),
                    init_fid=jnp.where(keep, st.init_fid,
                                       frame_id).astype(jnp.int32),
                    init_ts=jnp.where(keep, st.init_ts,
                                      ts).astype(jnp.float32),
                    mode=jnp.where(keep | usable, MODE_SECOND,
                                   MODE_FIRST).astype(jnp.int32),
                )
                return write_rec(st2, frame_id, st2.ref_kf, jnp.eye(3),
                                 jnp.zeros(3), jnp.asarray(False),
                                 st2.mode, res.count.astype(jnp.int32))

            return jax.lax.cond(succ, build, restash, st)

        def stash(st: FreeState):
            st2 = st._replace(
                init_f=frame,
                init_fid=jnp.where(usable, frame_id,
                                   st.init_fid).astype(jnp.int32),
                init_ts=jnp.where(usable, ts, st.init_ts).astype(jnp.float32),
                mode=jnp.where(usable, MODE_SECOND,
                               MODE_FIRST).astype(jnp.int32),
            )
            return write_rec(st2, frame_id, st2.ref_kf, jnp.eye(3),
                             jnp.zeros(3), jnp.asarray(False), st2.mode,
                             jnp.asarray(0, jnp.int32))

        return jax.lax.cond(st.mode == MODE_SECOND, try_init, stash, st)

    def init_branch_depth(cam, tab, vocab, st: FreeState, frame,
                          frame_id, ts):
        n_depth = jnp.sum(frame.valid & (frame.depth > 0))

        def build(st: FreeState):
            obs = jnp.full((N,), -1, jnp.int32)
            m, slot = lm.insert_keyframe_from_frame(
                st.m, frame, jnp.eye(3), jnp.zeros(3), obs, frame_id, ts,
                update_stats=False)
            baseline = cam.bf / cam.fx
            m = lm.create_depth_mappoints(m, cam, slot, TH_DEPTH * baseline,
                                          update_stats=True)
            bow = voc.bow_vector(vocab, m.kf_desc[slot],
                                 m.kf_feat_valid[slot])
            st2 = st._replace(
                m=m, bows=st.bows.at[slot].set(bow),
                R=jnp.eye(3), t=jnp.zeros(3),
                has_vel=jnp.asarray(False),
                mode=jnp.asarray(MODE_OK, jnp.int32),
                ref_kf=slot.astype(jnp.int32),
                last_kf_frame=frame_id.astype(jnp.int32),
                peak_n_local=jnp.asarray(0, jnp.int32),
                last=frame, last_obs=m.kf_obs[slot],
            )
            return write_rec(st2, frame_id, st2.ref_kf, jnp.eye(3),
                             jnp.zeros(3), jnp.asarray(True), st2.mode,
                             n_depth.astype(jnp.int32))

        def skip(st: FreeState):
            return write_rec(st, frame_id, st.ref_kf, jnp.eye(3),
                             jnp.zeros(3), jnp.asarray(False), st.mode,
                             jnp.asarray(0, jnp.int32))

        return jax.lax.cond(n_depth >= 300, build, skip, st)

    init_branch = init_branch_depth if has_depth else init_branch_mono

    # ---------------- the step --------------------------------------

    @partial(jax.jit, donate_argnums=(3,))
    def step_mono(cam: CameraModel, tab, vocab, st: FreeState,
                  image, frame_id, ts) -> FreeState:
        frame = _make_frame_mono(image, cam, tab, ecfg)
        return jax.lax.cond(
            st.mode <= MODE_SECOND,
            lambda s: init_branch(cam, tab, vocab, s, frame, frame_id, ts),
            lambda s: track_branch(cam, tab, vocab, s, frame, frame_id, ts),
            st,
        )

    @partial(jax.jit, donate_argnums=(3,))
    def step_rgbd(cam: CameraModel, tab, vocab, st: FreeState,
                  image, depth, frame_id, ts) -> FreeState:
        frame = _make_frame_rgbd(image, depth, cam, tab, ecfg)
        return jax.lax.cond(
            st.mode <= MODE_SECOND,
            lambda s: init_branch(cam, tab, vocab, s, frame, frame_id, ts),
            lambda s: track_branch(cam, tab, vocab, s, frame, frame_id, ts),
            st,
        )

    @partial(jax.jit, donate_argnums=(3,))
    def step_stereo(cam: CameraModel, tab, vocab, st: FreeState,
                    image_l, image_r, frame_id, ts) -> FreeState:
        frame = _make_frame_stereo(image_l, image_r, cam, tab, ecfg)
        return jax.lax.cond(
            st.mode <= MODE_SECOND,
            lambda s: init_branch(cam, tab, vocab, s, frame, frame_id, ts),
            lambda s: track_branch(cam, tab, vocab, s, frame, frame_id, ts),
            st,
        )

    if cfg.sensor == "rgbd":
        return step_rgbd
    if cfg.sensor == "stereo":
        return step_stereo
    return step_mono


class FreeRunner:
    """Host driver for the free-running loop.

    track_mono()/track_rgbd() only dispatch (zero device reads);
    finish() reads the rings + map once and returns the trajectory.
    """

    def __init__(self, cam: CameraModel, config: SlamConfig | None = None,
                 max_frames: int = 4096):
        from .loop_closing import LoopCloser, LoopCloserConfig

        self.cam = cam
        self.cfg = config or SlamConfig()
        assert self.cfg.max_mp >= self.cfg.n_features, \
            "free-running mono init maps feature index -> point slot"
        self.max_frames = max_frames
        self.tab = orb.tables()
        # vocabulary via LoopCloser's loader (trained npz if present)
        self._lc = LoopCloser(
            cam, self.cfg.max_kf,
            LoopCloserConfig(fix_scale=self.cfg.sensor != "mono"),
            seed=self.cfg.seed + 1)
        self.vocab = self._lc.vocab
        self.state = init_state(self.cfg, self._lc.cfg.n_words, max_frames)
        self._step = make_step(self.cfg)
        self.frame_id = -1
        self._timestamps: list[float] = []
        self._finished = None

    # -- dispatch-only per-frame API ----------------------------------

    def _check_capacity(self):
        if self.frame_id >= self.max_frames:
            raise RuntimeError(
                f"FreeRunner ring capacity exceeded: frame {self.frame_id}"
                f" >= max_frames={self.max_frames} (the device rings are"
                " statically sized; construct with a larger max_frames)")

    def track_mono(self, image, timestamp: float):
        self.frame_id += 1
        self._check_capacity()
        self._timestamps.append(timestamp)
        img = image if isinstance(image, jnp.ndarray) else jnp.asarray(
            np.asarray(image))
        self.state = self._step(
            self.cam, self.tab, self.vocab, self.state, img,
            jnp.asarray(self.frame_id, jnp.int32), jnp.asarray(timestamp))

    def track_rgbd(self, image, depth, timestamp: float):
        self.frame_id += 1
        self._check_capacity()
        self._timestamps.append(timestamp)
        img = jnp.asarray(np.asarray(image))
        dep = jnp.asarray(np.asarray(depth, np.float32))
        self.state = self._step(
            self.cam, self.tab, self.vocab, self.state, img, dep,
            jnp.asarray(self.frame_id, jnp.int32), jnp.asarray(timestamp))

    def track_stereo(self, image_l, image_r, timestamp: float):
        self.frame_id += 1
        self._check_capacity()
        self._timestamps.append(timestamp)
        il = jnp.asarray(np.asarray(image_l))
        ir = jnp.asarray(np.asarray(image_r))
        self.state = self._step(
            self.cam, self.tab, self.vocab, self.state, il, ir,
            jnp.asarray(self.frame_id, jnp.int32), jnp.asarray(timestamp))

    def warmup(self, image_shape=None):
        """Compile + first-execute the step program on throwaway state
        (axon pays a one-time executable-load at first execution)."""
        h, w = image_shape or (int(self.cam.height), int(self.cam.width))
        img = jnp.zeros((h, w), jnp.uint8)
        st = init_state(self.cfg, self._lc.cfg.n_words, self.max_frames)
        for fid in (0, 1):  # cover both cond arms' executions
            if self.cfg.sensor == "rgbd":
                dep = jnp.ones((h, w), jnp.float32)
                st = self._step(self.cam, self.tab, self.vocab, st, img,
                                dep, jnp.asarray(fid, jnp.int32),
                                jnp.asarray(0.0))
            elif self.cfg.sensor == "stereo":
                st = self._step(self.cam, self.tab, self.vocab, st, img,
                                img, jnp.asarray(fid, jnp.int32),
                                jnp.asarray(0.0))
            else:
                st = self._step(self.cam, self.tab, self.vocab, st, img,
                                jnp.asarray(fid, jnp.int32),
                                jnp.asarray(0.0))
        jax.block_until_ready(st.mode)

    def block(self):
        """Wait for all dispatched work WITHOUT reading anything."""
        jax.block_until_ready(self.state.mode)

    # -- one-shot readback --------------------------------------------

    def finish(self, resolve_loops: bool = False):
        """Read everything once and recover the full trajectory through
        the (loop-corrected) keyframe poses.  Loop closures happen LIVE
        on device during the run (free_loop_stage inside the per-frame
        program); resolve_loops=True additionally replays the host
        detection funnel over the recorded keyframes afterwards (useful
        when live closing was disabled).

        Returns dict with trajectory [(frame_id, T4x4 | None)], map,
        n_keyframes, n_loops_closed, modes, n_local per frame.
        """
        if self._finished is not None:
            return self._finished
        st = self.state
        n = self.frame_id + 1
        traj = np.asarray(st.traj)[:n]
        traj_ref = np.asarray(st.traj_ref)[:n]
        traj_ok = np.asarray(st.traj_ok)[:n]
        modes = np.asarray(st.ring_mode)[:n]
        nlocal = np.asarray(st.ring_nlocal)[:n]
        m = st.m

        n_loops = int(st.n_loops)
        if resolve_loops:
            # offline replay over the recorded keyframes — the fallback
            # when live closing was disabled (enable_loop_closing=False
            # keeps the per-frame program lean)
            m, extra = self._replay_loops(m, st)
            n_loops += extra
        if n_loops > 0 and self._lc.cfg.run_global_ba:
            # global BA after loop closure (RunGlobalBundleAdjustment,
            # LoopClosing.cc:756): the live device funnel applies the
            # essential-graph correction; the full-map refinement runs
            # here, once, after the sequence (the reference's GBA is
            # asynchronous to tracking for the same reason)
            m = self._global_ba(m)

        kf_R = np.asarray(m.kf_R)
        kf_t = np.asarray(m.kf_t)
        out = []
        for k in range(n):
            if not traj_ok[k]:
                out.append((k, None))
                continue
            Rcr = traj[k, :9].reshape(3, 3)
            tcr = traj[k, 9:12]
            ref = int(traj_ref[k])
            R = Rcr @ kf_R[ref]
            t = Rcr @ kf_t[ref] + tcr
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R
            T[:3, 3] = t
            out.append((k, T))
        self._finished = dict(
            trajectory=out, map=m, modes=modes, n_local=nlocal,
            loop_diag=np.asarray(st.ring_loop)[:n],
            n_keyframes=int(np.asarray(m.kf_valid).sum()),
            n_mappoints=int(np.asarray(m.mp_valid).sum()),
            n_loops_closed=n_loops,
            timestamps=self._timestamps,
        )
        return self._finished

    def _global_ba(self, m: ms.MapState) -> ms.MapState:
        """Full-map bundle adjustment anchored at the oldest keyframe
        (GlobalBundleAdjustemnt [sic], Optimizer.cc:42)."""
        from ..solvers import ba_cg
        from ..solvers.ba_core import BAProblem

        K, P, N = m.K, m.P, m.N
        obs = m.kf_obs
        feat_ok = m.kf_feat_valid & m.kf_valid[:, None]
        e_valid = feat_ok & (obs >= 0) & m.mp_valid[jnp.clip(obs, 0)]
        cam_idx = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N)).reshape(-1)
        octv = m.kf_octave.reshape(-1).astype(jnp.float32)
        fid = np.asarray(m.kf_frame_id)
        anchor = int(np.argmin(np.where(np.asarray(m.kf_valid), fid, 1 << 30)))
        prob = BAProblem(
            R=m.kf_R, t=m.kf_t, points=m.mp_pos,
            cam_fixed=jnp.zeros((K,), bool).at[anchor].set(True)
            | ~m.kf_valid,
            cam_valid=m.kf_valid, pt_valid=m.mp_valid,
            cam_idx=cam_idx.astype(jnp.int32),
            pt_idx=jnp.clip(obs, 0).reshape(-1).astype(jnp.int32),
            uv=m.kf_xy.reshape(-1, 2), ur=m.kf_ur.reshape(-1),
            inv_sigma2=1.0 / (1.2 ** (2.0 * octv)),
            edge_valid=e_valid.reshape(-1),
        )
        R, t, X, _, _ = ba_cg.bundle_adjust_cg(
            cam=self.cam, prob=prob, iters=self._lc.cfg.global_ba_iters)
        return ms.update_mappoint_stats(
            m._replace(kf_R=R, kf_t=t, mp_pos=X))

    def _replay_loops(self, m: ms.MapState, st: FreeState):
        """Ordered replay of loop detection/resolution over the recorded
        keyframes (LoopClosing runs asynchronously to tracking in the
        reference; here it runs after the sequence, correcting the map +
        trajectory retroactively through the Tcr records)."""
        lc = self._lc
        kf_valid = np.asarray(m.kf_valid)
        fids = np.asarray(m.kf_frame_id)
        order = [s for s in np.argsort(fids) if kf_valid[s]]
        closed = 0
        for i, slot in enumerate(order):
            det = lc.dispatch_detection(m, int(slot))
            m, did = lc.resolve_detection(m, int(slot), det, seq_i=i)
            closed += bool(did)
        return m, closed


__all__ = ["FreeRunner", "FreeState", "make_step", "init_state"]
