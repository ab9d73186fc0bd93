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
        kf_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_feat_valid=jnp.zeros((K, N), bool),
        kf_obs=jnp.full((K, N), -1, jnp.int32),
        mp_pos=jnp.zeros((P, 3), jnp.float32),
        mp_valid=jnp.zeros((P,), bool),
        mp_desc=jnp.zeros((P, 8), jnp.uint32),
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
    Of = O.astype(jnp.float32)
    W = (Of @ Of.T).astype(jnp.int32)
    return W * (1 - jnp.eye(m.K, dtype=jnp.int32))


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
    """First invalid keyframe slot (i32)."""
    return jnp.argmin(m.kf_valid)


def free_mp_slots(m: MapState, count: int) -> jnp.ndarray:
    """Indices of `count` free map-point slots ([count] i32).

    Uses top_k over ~valid; if the map is full the trailing returns alias
    occupied slots — callers must check `mp_valid` afterwards (capacity is
    sized so this does not happen in practice).
    """
    free = (~m.mp_valid).astype(jnp.int32)
    _, idx = jax.lax.top_k(free, count)
    return idx


MAX_OBS = 16


def observation_table(m: MapState):
    """Padded per-point observation lists.

    Returns (obs_kf [P,MAX_OBS] i32, obs_ft [P,MAX_OBS] i32,
    obs_cnt [P] i32, obs_mask [P,MAX_OBS] bool): for each map point, up
    to MAX_OBS (keyframe, feature) observation pairs, gathered with one
    stable sort over the flattened kf_obs array.
    """
    K, P, N = m.K, m.P, m.N
    flat_obs = jnp.where(
        m.kf_feat_valid & m.kf_valid[:, None], m.kf_obs, -1
    ).reshape(-1)  # [K*N]
    order = jnp.argsort(flat_obs, stable=True)  # groups by p, (k,n)-ordered within
    sorted_obs = flat_obs[order]
    idx = jnp.arange(K * N)
    grp_start = jnp.searchsorted(sorted_obs, jnp.arange(P))
    rank = idx - grp_start[jnp.clip(sorted_obs, 0)]
    valid_o = (sorted_obs >= 0) & (rank < MAX_OBS)
    pt = jnp.where(valid_o, sorted_obs, P)  # P = dump row
    col = jnp.where(valid_o, rank, 0)

    obs_kf = jnp.zeros((P + 1, MAX_OBS), jnp.int32).at[pt, col].set(
        (order // N).astype(jnp.int32)
    )[:P]
    obs_ft = jnp.zeros((P + 1, MAX_OBS), jnp.int32).at[pt, col].set(
        (order % N).astype(jnp.int32)
    )[:P]
    obs_cnt = jnp.zeros((P + 1,), jnp.int32).at[pt].add(valid_o.astype(jnp.int32))[:P]
    obs_mask = jnp.arange(MAX_OBS)[None, :] < obs_cnt[:, None]
    return obs_kf, obs_ft, obs_cnt, obs_mask


@jax.jit
def update_mappoint_stats(m: MapState) -> MapState:
    """Recompute distinctive descriptors, normals and depth bands for all
    valid map points from their observations.

    Replaces MapPoint::ComputeDistinctiveDescriptors (min-median-Hamming,
    MapPoint.cc:269-333) and UpdateNormalAndDepth (MapPoint.cc:360-404),
    batched over every point at once.  MAX_OBS observations per point are
    collected by scatter into a padded [P, MAX_OBS] table.
    """
    from ..ops.hamming import hamming_pairwise

    K, P, N = m.K, m.P, m.N
    obs_kf, obs_ft, obs_cnt, obs_mask = observation_table(m)

    # ---- distinctive descriptor: min median distance among observations
    descs = m.kf_desc[obs_kf, obs_ft]  # [P, MAX_OBS, 8]
    d = jax.vmap(hamming_pairwise)(descs, descs)  # [P, MAX_OBS, MAX_OBS]
    big = 512
    dm = jnp.where(obs_mask[:, None, :], d, big)
    dsort = jnp.sort(dm, axis=-1)  # [P, O, O]
    med_idx = jnp.clip((obs_cnt - 1) // 2, 0, MAX_OBS - 1)  # [P]
    mi = jnp.broadcast_to(med_idx[:, None, None], (P, MAX_OBS, 1))
    med = jnp.take_along_axis(dsort, mi, axis=-1)[..., 0]  # [P, O]
    med = jnp.where(obs_mask, med, big)
    best = jnp.argmin(med, axis=1)  # [P]
    new_desc = jnp.take_along_axis(descs, best[:, None, None].repeat(8, -1), axis=1)[
        :, 0
    ]

    # ---- normal & depth band
    cam_centers = -jnp.einsum("kij,ki->kj", m.kf_R.transpose(0, 2, 1), m.kf_t)  # [K,3]
    centers = cam_centers[obs_kf]  # [P, O, 3]
    dirs = m.mp_pos[:, None, :] - centers
    norms = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs_n = dirs / jnp.maximum(norms, 1e-9)
    normal = jnp.sum(jnp.where(obs_mask[..., None], dirs_n, 0.0), axis=1)
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)

    # reference: distance to the *reference* (first) observation KF, scaled
    # by that keypoint's octave (MapPoint.cc:378-404)
    ref_dist = jnp.linalg.norm(m.mp_pos - centers[:, 0], axis=-1)
    ref_oct = m.kf_octave[obs_kf[:, 0], obs_ft[:, 0]]
    scale = 1.2 ** ref_oct.astype(jnp.float32)
    n_levels = 8
    max_dist = ref_dist * scale
    min_dist = max_dist / (1.2 ** (n_levels - 1))

    has_obs = obs_cnt > 0
    upd = m.mp_valid & has_obs
    return m._replace(
        mp_desc=jnp.where(upd[:, None], new_desc, m.mp_desc),
        mp_normal=jnp.where(upd[:, None], normal, m.mp_normal),
        mp_min_dist=jnp.where(upd, 0.8 * min_dist, m.mp_min_dist),
        mp_max_dist=jnp.where(upd, 1.2 * max_dist, m.mp_max_dist),
        mp_valid=m.mp_valid & has_obs,
    )


def mp_observation_counts(m: MapState) -> jnp.ndarray:
    """n_obs[P]: number of keyframes observing each point."""
    O = observation_matrix(m)
    return jnp.sum(O, axis=0).astype(jnp.int32)
