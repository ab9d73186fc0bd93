"""Loop closing: detection, Sim3 computation, loop correction, pose graph.

The counterpart of LoopClosing.cc, restructured host-orchestrated +
device-batched:

* detect      — BoW scores against the keyframe database with the
                covisibility-consistency rule over consecutive keyframes
                (DetectLoop, LoopClosing.cc:117; th=3 consecutive groups)
* compute_sim3— brute-force descriptor matching of the two keyframes'
                map points + batched Sim3 RANSAC (ComputeSim3,
                LoopClosing.cc:286; accept >= 20 RANSAC inliers and
                >= 40 total matches after the guided pass)
* correct     — propagate the corrective Sim3 to the current keyframe's
                covisible group, remap their points, fuse duplicates,
                optimize the essential graph, and recover SE3 poses
                (CorrectLoop, LoopClosing.cc:478-666)

The reference runs this on its own thread with queue handoff; here the
System calls `on_keyframe` after local mapping — detection costs one
[K, W] matvec, so there is no need to decouple rates.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import lie
from ..geometry.camera import CameraModel
from ..ops import matching
from ..solvers import sim3 as sim3_solver
from ..solvers.pose_graph import PoseGraphProblem, edge_measurement, optimize_pose_graph
from ..worldmap import map_state as ms
from ..worldmap import vocabulary as voc

MIN_COVIS_LOOP = 100  # essential-graph covisibility edge weight (Optimizer.cc:858)


class LoopDetectOut(NamedTuple):
    """Small prefetchable bundle from one fused detection dispatch."""
    db_bows: jnp.ndarray     # [K, W] database with the new row added
    cands: jnp.ndarray       # [8] candidate slots
    ok: jnp.ndarray          # [8] bool
    cand_covis: jnp.ndarray  # [8, K] covisibility rows of the candidates


@partial(jax.jit, static_argnums=(4,))
def detect_loop_device(vocab, db_bows, m: ms.MapState, slot,
                       gap_kf: int = 10) -> LoopDetectOut:
    """The device half of DetectLoop (LoopClosing.cc:117-230) in one
    program: BoW transform of the new keyframe, min covisible-neighbor
    score, candidate retrieval excluding the covisible group and the
    `gap_kf` newest keyframes, plus the candidates' covisibility rows
    (for the host's consistency-streak bookkeeping).  Also returns the
    database with the new keyframe's row written (KeyFrameDatabase::add).
    """
    K = m.K
    bow = voc.bow_vector(vocab, m.kf_desc[slot], m.kf_feat_valid[slot])
    W = ms.covisibility(m)
    covis_row = W[slot]
    covis_mask = (covis_row > 0).at[slot].set(True)

    # minScore = lowest BoW similarity among covisible neighbors
    # (DetectLoop, LoopClosing.cc:130-144)
    others = covis_mask & m.kf_valid & (jnp.arange(K) != slot)
    scores = voc.l1_scores(db_bows, bow)
    nb_scores = jnp.where(others, scores, jnp.inf)
    min_score = jnp.min(nb_scores)
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 0.0)

    # exclude the covisible group and the gap_kf most recent keyframes.
    # The reference only excludes the covisible group (DetectLoop,
    # KeyFrameDatabase.cc:95-219) and instead gates detection entirely
    # for 10 KFs after startup/last loop (LoopClosing.cc:110); a small
    # recency exclusion (gap_kf=3) keeps immediate predecessors that
    # covisibility misses out of candidacy.
    fid = jnp.where(m.kf_valid, m.kf_frame_id, -1)
    order = jnp.argsort(-fid)
    recent = jnp.zeros((K,), bool).at[order[:gap_kf]].set(True)
    exclude = covis_mask | recent

    slots, ok = voc.detect_loop_candidates(
        voc.KeyFrameDatabase(db_bows), bow, m.kf_valid, exclude, min_score
    )
    return LoopDetectOut(
        db_bows.at[slot].set(bow), slots, ok, W[slots].astype(jnp.int32)
    )


@dataclasses.dataclass
class LoopCloserConfig:
    n_words: int = 4096
    consistency_th: int = 3       # consecutive-KF consistency (LoopClosing.cc:44)
    min_ransac_inliers: int = 20
    min_total_matches: int = 40
    fix_scale: bool = False       # True for stereo/RGBD
    pose_graph_iters: int = 15
    gap_kf: int = 3               # candidate must be >= this many KFs old
    cooldown_kf: int = 10         # skip detection for this many KFs after
                                  # startup / the last closure (LoopClosing.cc:110)
    run_global_ba: bool = True    # full BA after the essential graph
    global_ba_iters: int = 10     # (RunGlobalBundleAdjustment, :756)


class LoopCloser:
    def __init__(self, cam: CameraModel, max_kf: int,
                 config: LoopCloserConfig | None = None, seed: int = 42):
        self.cam = cam
        self.cfg = config or LoopCloserConfig()
        self.vocab = voc.make_vocabulary(self.cfg.n_words, seed)
        self.db = voc.KeyFrameDatabase.create(max_kf, self.cfg.n_words)
        # host-side consistency bookkeeping: candidate slot -> streak length
        self._streaks: dict[int, int] = {}
        self.loop_edges: list[tuple[int, int]] = []  # (slot_a, slot_b)
        self.n_loops_closed = 0
        self._last_loop_kf = 0       # map.n_kf at the last closure

    # ------------------------------------------------------------------

    def dispatch_detection(self, m: ms.MapState, slot) -> LoopDetectOut:
        """Dispatch the fused detection program (slot may be a device
        scalar) and update the database.  The returned bundle's small
        arrays are prefetched so a later resolve_detection() does not
        block on the device."""
        out = detect_loop_device(self.vocab, self.db.bows, m, slot,
                                 self.cfg.gap_kf)
        self.db = voc.KeyFrameDatabase(out.db_bows)
        for a in (out.cands, out.ok, out.cand_covis):
            a.copy_to_host_async()
        return out

    def resolve_detection(self, m: ms.MapState, slot: int,
                          det: LoopDetectOut):
        """Host half: consistency streaks over consecutive keyframes
        (DetectLoop's nCovisibilityConsistencyTh=3 groups), then — rarely
        — the Sim3 + loop correction.  Returns (map, closed)."""
        cfg = self.cfg
        # cooldown: no closures within cooldown_kf keyframes of startup or
        # the previous closure (mnId < mLastLoopKFid+10, LoopClosing.cc:110);
        # keyed on the map's monotonic keyframe counter like the reference's
        # keyframe ids
        if int(m.n_kf) < self._last_loop_kf + cfg.cooldown_kf:
            self._streaks = {}
            return m, False
        cands_np = np.asarray(det.cands)
        ok_np = np.asarray(det.ok)
        covrows = np.asarray(det.cand_covis)  # [8, K]
        cands = [(int(s), covrows[i]) for i, (s, o)
                 in enumerate(zip(cands_np, ok_np)) if o]

        # --- covisibility-consistency streaks (simplified groups: a
        # candidate is consistent with a previous detection if it is the
        # same slot or covisible with one)
        new_streaks: dict[int, int] = {}
        confirmed = None
        for c, wrow in cands:
            streak = 1
            for prev, n in self._streaks.items():
                if prev == c or wrow[prev] > 0:
                    streak = max(streak, n + 1)
            new_streaks[c] = streak
            if streak >= cfg.consistency_th and confirmed is None:
                confirmed = c
        self._streaks = new_streaks
        if confirmed is None:
            return m, False

        # --- Sim3 between slot and confirmed candidate
        res = self._compute_sim3(m, slot, confirmed)
        if res is None:
            return m, False
        s12, R12, t12 = res  # maps candidate-camera coords -> slot-camera

        m = self._correct_loop(m, slot, confirmed, s12, R12, t12)
        self._streaks = {}
        self.n_loops_closed += 1
        self._last_loop_kf = int(m.n_kf)
        return m, True

    def on_keyframe(self, m: ms.MapState, slot: int):
        """Synchronous detect + resolve for keyframe `slot`.
        Returns (possibly corrected) MapState and a bool 'loop closed'."""
        det = self.dispatch_detection(m, slot)
        return self.resolve_detection(m, int(slot), det)

    # ------------------------------------------------------------------

    def _compute_sim3(self, m: ms.MapState, slot: int, cand: int):
        """Match map points of the two keyframes, RANSAC a Sim3.
        Returns (s, R, t) with x_slot ~ s R x_cand + t, or None."""
        cfg = self.cfg
        obs1 = m.kf_obs[slot]
        obs2 = m.kf_obs[cand]
        has1 = (obs1 >= 0) & m.kf_feat_valid[slot] & m.mp_valid[jnp.clip(obs1, 0)]
        has2 = (obs2 >= 0) & m.kf_feat_valid[cand] & m.mp_valid[jnp.clip(obs2, 0)]

        cand_mask = has1[:, None] & has2[None, :]
        res = matching.match_masked(
            m.kf_desc[slot], m.kf_desc[cand], cand_mask,
            max_dist=matching.TH_LOW, ratio=0.75, mutual=True,
        )
        n_matches = int(res.count)
        if n_matches < cfg.min_ransac_inliers:
            return None

        idx2 = jnp.clip(res.idx, 0)
        mp1 = jnp.clip(obs1, 0)
        mp2 = jnp.clip(obs2[idx2], 0)
        # camera-frame coordinates in each keyframe (Sim3Solver.cc:66-99)
        x1 = m.mp_pos[mp1] @ m.kf_R[slot].T + m.kf_t[slot]
        x2 = m.mp_pos[mp2] @ m.kf_R[cand].T + m.kf_t[cand]
        uv1 = m.kf_xy[slot]
        uv2 = m.kf_xy[cand][idx2]
        valid = res.matched

        r = sim3_solver.sim3_ransac(
            jax.random.PRNGKey(int(m.n_kf)), self.cam,
            x2, x1, uv2, uv1, 128, cfg.fix_scale, valid=valid,
        )
        if not bool(r.success) or int(r.n_inliers) < cfg.min_ransac_inliers:
            return None
        if n_matches < cfg.min_total_matches:
            return None
        return float(r.s), r.R, r.t

    # ------------------------------------------------------------------

    def _correct_loop(self, m: ms.MapState, slot: int, cand: int,
                      s12: float, R12, t12) -> ms.MapState:
        """Apply the corrective Sim3 and optimize the essential graph."""
        cfg = self.cfg
        K = m.K

        # corrected Sim3 pose of `slot`: S_slot_corr = S12 * S_cand
        # (LoopClosing.cc:327 gScm * Swc semantics adapted: candidate pose
        # is trusted; slot and its neighborhood get corrected)
        s_c, R_c, t_c = lie.sim3_compose(
            jnp.asarray(s12), jnp.asarray(R12), jnp.asarray(t12),
            jnp.ones(()), m.kf_R[cand], m.kf_t[cand],
        )

        # --- build the Sim3 pose-graph over all valid keyframes
        kf_valid = np.asarray(m.kf_valid)
        ids = np.nonzero(kf_valid)[0]
        Kv = len(ids)
        loc = {int(g): i for i, g in enumerate(ids)}

        s0 = np.ones(Kv, np.float32)
        R0 = np.array(m.kf_R[jnp.asarray(ids)])  # writable copies
        t0 = np.array(m.kf_t[jnp.asarray(ids)])
        # slot starts at its corrected pose (non-corrected neighbors will be
        # pulled by the optimization; reference corrects the covisible group
        # explicitly first — the pose graph achieves the same fixed point)
        s0[loc[slot]] = float(s_c)
        R0[loc[slot]] = np.asarray(R_c)
        t0[loc[slot]] = np.asarray(t_c)

        fixed = np.zeros(Kv, bool)
        fixed[loc[cand]] = True  # LoopClosing fixes the matched KF

        # edges: spanning tree + strong covisibility + loop edges
        W = np.asarray(ms.covisibility(m))
        parents = np.asarray(ms.spanning_tree_parents(m))
        e_i, e_j = [], []
        for g in ids:
            p = parents[g]
            if p >= 0:
                e_i.append(loc[int(p)])
                e_j.append(loc[int(g)])
        for a_i, b_i in zip(*np.nonzero(np.triu(W >= MIN_COVIS_LOOP))):
            if kf_valid[a_i] and kf_valid[b_i]:
                e_i.append(loc[int(a_i)])
                e_j.append(loc[int(b_i)])
        # historic loop edges only: their endpoints were made consistent at
        # their own closure, so current relative poses are the right
        # measurement.  The NEW loop edge must NOT be added here — its
        # pre-correction relative pose encodes exactly the drift being
        # corrected; it is appended below with the computed Sim3 instead.
        for a, b in self.loop_edges:
            if kf_valid[a] and kf_valid[b]:
                e_i.append(loc[a])
                e_j.append(loc[b])
        E = len(e_i)
        e_i = np.asarray(e_i, np.int32)
        e_j = np.asarray(e_j, np.int32)

        # measurements from PRE-correction poses (S_ji = S_j S_i^-1),
        # except the loop edge which uses the computed Sim3
        sj = jnp.ones((E,))
        Sji = jax.vmap(edge_measurement)(
            jnp.ones((E,)), m.kf_R[jnp.asarray(ids[e_i])], m.kf_t[jnp.asarray(ids[e_i])],
            jnp.ones((E,)), m.kf_R[jnp.asarray(ids[e_j])], m.kf_t[jnp.asarray(ids[e_j])],
        )
        e_s, e_R, e_t = (np.asarray(x) for x in Sji)
        # loop edge measurement: S_slot_cand = S12^-1? edge (slot -> cand):
        # r uses S_ji with i=slot, j=cand: S_cand_slot = S_cand * S_slot^-1
        # with the CORRECTED relation: S_slot = S12 * S_cand =>
        # S_cand * S_slot^-1 = S12^-1
        si_, Ri_, ti_ = lie.sim3_inverse(
            jnp.asarray(s12), jnp.asarray(R12), jnp.asarray(t12)
        )
        e_i = np.append(e_i, loc[slot]).astype(np.int32)
        e_j = np.append(e_j, loc[cand]).astype(np.int32)
        e_s = np.append(e_s, float(si_)).astype(np.float32)
        e_R = np.concatenate([e_R, np.asarray(Ri_)[None]], 0).astype(np.float32)
        e_t = np.concatenate([e_t, np.asarray(ti_)[None]], 0).astype(np.float32)
        E += 1

        prob = PoseGraphProblem(
            s=jnp.asarray(s0), R=jnp.asarray(R0), t=jnp.asarray(t0),
            fixed=jnp.asarray(fixed), valid=jnp.ones(Kv, bool),
            e_i=jnp.asarray(e_i), e_j=jnp.asarray(e_j),
            e_s=jnp.asarray(e_s), e_R=jnp.asarray(e_R), e_t=jnp.asarray(e_t),
            e_valid=jnp.ones(E, bool), e_weight=jnp.ones(E),
        )
        s_o, R_o, t_o, cost = optimize_pose_graph(prob, cfg.pose_graph_iters)

        # --- write back: SE3 = [R, t/s] (Optimizer.cc:1073-1081)
        s_np = np.asarray(s_o)
        R_np = np.asarray(R_o)
        t_np = np.asarray(t_o) / s_np[:, None]

        # --- transform map points by their reference KF's correction:
        # X' = S_new^-1 * S_old * X  per point, using the point's first
        # observing keyframe (Optimizer.cc:1087-1103)
        O = np.asarray(ms.observation_matrix(m))  # [K, P]
        # first observing KF per point (in global slot index)
        first_kf = np.full(m.P, -1, np.int64)
        for g in ids[::-1]:
            first_kf[O[g]] = g
        mp_valid = np.asarray(m.mp_valid)
        pos = np.asarray(m.mp_pos).copy()
        for i, g in enumerate(ids):
            sel = mp_valid & (first_kf == g)
            if not sel.any():
                continue
            R_old = np.asarray(m.kf_R[int(g)])
            t_old = np.asarray(m.kf_t[int(g)])
            xc = pos[sel] @ R_old.T + t_old          # old camera coords
            # new world coords via corrected Sim3 inverse: X = (R^T (s^-1 xc - t/s...))
            s_n, R_n, t_n = s_np[i], R_np[i], np.asarray(t_o)[i]
            xw = ((xc - t_n) / s_n) @ R_n            # (s R)^-1 (xc - t)
            pos[sel] = xw

        kf_R = np.asarray(m.kf_R).copy()
        kf_t = np.asarray(m.kf_t).copy()
        kf_R[ids] = R_np
        kf_t[ids] = t_np

        m = m._replace(
            kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
            mp_pos=jnp.asarray(pos),
        )
        m = ms.update_mappoint_stats(m)
        if cfg.run_global_ba:
            m = self._global_ba(m, anchor=cand)
        self.loop_edges.append((slot, cand))
        return m

    # ------------------------------------------------------------------

    def _global_ba(self, m: ms.MapState, anchor: int) -> ms.MapState:
        """Full-map bundle adjustment after a loop closure
        (RunGlobalBundleAdjustment, LoopClosing.cc:756) using the
        matrix-free Schur-PCG engine (scales past the dense solver)."""
        from ..solvers import ba_cg
        from ..solvers.ba_core import BAProblem

        K, P, N = m.K, m.P, m.N
        obs = m.kf_obs
        feat_ok = m.kf_feat_valid & m.kf_valid[:, None]
        e_valid = feat_ok & (obs >= 0) & m.mp_valid[jnp.clip(obs, 0)]
        cam_idx = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N)).reshape(-1)
        pt_idx = jnp.clip(obs, 0).reshape(-1)
        octv = m.kf_octave.reshape(-1).astype(jnp.float32)
        inv_s2 = 1.0 / (1.2 ** (2.0 * octv))
        cam_fixed = jnp.zeros((K,), bool).at[anchor].set(True)
        prob = BAProblem(
            R=m.kf_R, t=m.kf_t, points=m.mp_pos,
            cam_fixed=cam_fixed | ~m.kf_valid,
            cam_valid=m.kf_valid, pt_valid=m.mp_valid,
            cam_idx=cam_idx.astype(jnp.int32), pt_idx=pt_idx.astype(jnp.int32),
            uv=m.kf_xy.reshape(-1, 2), ur=m.kf_ur.reshape(-1),
            inv_sigma2=inv_s2, edge_valid=e_valid.reshape(-1),
        )
        R, t, X, inlier, cost = ba_cg.bundle_adjust_cg(
            self.cam, prob, iters=self.cfg.global_ba_iters, cg_iters=25,
        )
        bad = prob.edge_valid & ~inlier
        kf_obs = jnp.where(bad.reshape(K, N), -1, m.kf_obs)
        m = m._replace(kf_R=R, kf_t=t, mp_pos=X, kf_obs=kf_obs)
        return ms.update_mappoint_stats(m)
