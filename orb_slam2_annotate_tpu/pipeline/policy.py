"""Shared per-frame policy + map-bootstrap builders.

ONE source of truth for the decisions and constructions that round 3
implemented twice — once host-side in System (system.py) and once as
traced device code in the free-running loop (device_loop.py); VERDICT r3
weak item 2 (silent divergence risk).  Every function here is written so
it works BOTH ways:

* the policy predicates use only operators (`>=`, `&`, `|`) so they
  evaluate on host ints (System's per-frame readback path) and on traced
  device scalars (FreeRunner's zero-read path) without creating device
  arrays from host inputs — on the axon remote-TPU runtime, wrapping a
  host int in jnp would dispatch to (and then read from) the TPU and
  permanently poison the session (RESULTS.md).
* the builders are pure jnp (jit-traceable); System calls them as
  regular dispatches, the free step inlines them into its program.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.camera import CameraModel
from ..worldmap import map_state as ms
from ..worldmap import vocabulary as voc
from .frame import Frame


def need_new_keyframe(since, n_local, peak, *, min_frames: int,
                      max_frames: int, ref_ratio: float, min_track: int):
    """The keyframe decision (NeedNewKeyFrame, Tracking.cc:1075).

    c1: too long since the last keyframe (mMaxFrames, Tracking.cc:1090).
    c2: tracked-point count decayed well below its in-window peak — the
    functional analog of mnMatchesInliers < 0.9 * nRefMatches
    (Tracking.cc:1098); the peak makes the baseline self-calibrating.

    Inputs may be host ints OR traced device scalars; returns the same
    kind.  Callers add their own environment gates (tracking OK, free
    slot exists, localization mode off).
    """
    peak1 = max(peak, 1) if isinstance(peak, int) else jnp.maximum(peak, 1)
    c1 = since >= max_frames
    c2 = n_local < ref_ratio * peak1
    return (since >= min_frames) & (c1 | c2) & (n_local > min_track)


def build_mono_init_map(m: ms.MapState, cam: CameraModel, f0: Frame,
                        frame: Frame, init, match_idx,
                        init_fid, init_ts, frame_id, ts):
    """Construct the two-keyframe bootstrap map from a successful
    two-view initialization (CreateInitialMapMonocular,
    Tracking.cc:701-800): scale-normalize to median depth 1, insert KF0
    (identity) + KF1, create one map point per good triangulation (point
    slot = KF0 feature index; requires P >= N), refresh point stats, and
    run the initial two-view BA (Tracking.cc:771 GlobalBundleAdjustemnt).

    match_idx: [N] KF0-feature -> frame-feature match (-1 = none), as
    returned by matching.search_for_initialization.
    Returns (map, obs1 [N] frame-feature -> point id).
    """
    from . import local_mapping as lm

    N = f0.xy.shape[0]
    good = init.good
    X = init.points
    z = jnp.where(good & (X[:, 2] > 0), X[:, 2], jnp.nan)
    med = jnp.nan_to_num(jnp.nanmedian(z), nan=1.0)
    med = jnp.where(med > 1e-6, med, 1.0)
    X = X / med
    t1 = init.t / med

    mp_ids = jnp.arange(N, dtype=jnp.int32)
    obs0 = jnp.where(good, mp_ids, -1)
    obs1 = jnp.full((N,), -1, jnp.int32).at[
        jnp.clip(match_idx, 0)].max(jnp.where(good, mp_ids, -1))

    m = ms.insert_keyframe(
        m, jnp.asarray(0), jnp.eye(3), jnp.zeros(3), init_fid, init_ts,
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
    # stats for the (<= N) bootstrap points only: a FULL pass would scale
    # with the map's P capacity (relevant when re-initializing after an
    # auto-reset at a grown tier — see ms.update_mappoint_geometry)
    m = ms.update_mappoint_stats_touched(m, mp_valid)
    out = lm.local_bundle_adjustment(m, cam, jnp.asarray(1),
                                     update_stats=False)
    m = ms.update_mappoint_stats_touched(out.map, mp_valid)
    return m, obs1


def build_depth_init_map(m: ms.MapState, cam: CameraModel, frame: Frame,
                         frame_id, ts, max_depth):
    """Stereo/RGB-D bootstrap (StereoInitialization, Tracking.cc:549):
    one keyframe at the origin, map points from every depth-valid
    feature within the close-depth threshold.  Returns (map, slot)."""
    from . import local_mapping as lm

    obs = jnp.full((frame.xy.shape[0],), -1, jnp.int32)
    m, slot = lm.insert_keyframe_from_frame(
        m, frame, jnp.eye(3), jnp.zeros(3), obs, frame_id, ts,
        update_stats=False)
    m = lm.create_depth_mappoints(m, cam, slot, max_depth,
                                  update_stats=False)
    # only the fresh depth points need stats (scales to grown tiers);
    # mp_first_kf carries the monotonic keyframe counter (n_kf - 1 for
    # the keyframe just inserted), not the slot id
    m = ms.update_mappoint_stats_touched(m, m.mp_first_kf == m.n_kf - 1)
    return m, slot


def keyframe_bows(vocab, m: ms.MapState):
    """[K, W] BoW rows for every valid keyframe (zeros elsewhere) — the
    KeyFrameDatabase rebuild used by load-map on both paths."""
    import jax

    rows = jax.vmap(
        lambda d, v: voc.bow_vector(vocab, d, v)
    )(m.kf_desc, m.kf_feat_valid & m.kf_valid[:, None])
    return jnp.where(m.kf_valid[:, None], rows, 0.0)
