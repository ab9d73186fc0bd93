"""Tests for pyramid / FAST / ORB extraction / Hamming matching."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_annotate_tpu.ops.orb import DESC_WORDS as DW, N_BITS as NB
from orb_slam2_annotate_tpu.ops import (
    ExtractorConfig, extract, fast, hamming, matching, orb, pyramid,
)


def synthetic_image(h=240, w=320, seed=0, n_blobs=80):
    """Textured test image: random gaussian blobs + gradient background."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 40.0 + 0.1 * xx + 0.05 * yy
    for _ in range(n_blobs):
        cx, cy = rng.uniform(10, w - 10), rng.uniform(10, h - 10)
        amp = rng.uniform(40, 180)
        s = rng.uniform(1.5, 6.0)
        img += amp * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
    return np.clip(img, 0, 255).astype(np.float32)


IMG = synthetic_image()


def test_gaussian_blur_matches_opencv():
    ours = np.asarray(pyramid.gaussian_blur(jnp.asarray(IMG)))
    ref = cv2.GaussianBlur(IMG, (7, 7), 2.0, borderType=cv2.BORDER_REFLECT_101)
    np.testing.assert_allclose(ours, ref, atol=0.05)


def test_pyramid_shapes():
    levels = pyramid.build_pyramid(jnp.asarray(IMG), 8, 1.2)
    shapes = pyramid.pyramid_shapes(240, 320, 8, 1.2)
    assert [lv.shape for lv in levels] == shapes
    assert shapes[0] == (240, 320)
    # each level ~1/1.2 of previous
    for (h1, w1), (h2, w2) in zip(shapes, shapes[1:]):
        assert abs(w2 * 1.2 - w1) < 2


def test_features_per_level_sums_to_budget():
    counts = pyramid.features_per_level(1000, 8, 1.2)
    assert sum(counts) == 1000
    assert counts[0] > counts[-1] > 0


def test_fast_agrees_with_opencv():
    """Our FAST-9 segment test should fire on mostly the same pixels as
    cv2.FastFeatureDetector (nonmax suppressed, same threshold)."""
    th = 20
    img_u8 = IMG.astype(np.uint8).astype(np.float32)  # feed cv2's exact input
    score, is_hi = fast.fast_score_map(jnp.asarray(img_u8), float(th), float(th))
    score = np.asarray(fast.nms3x3(score))
    ours = {(int(x), int(y)) for y, x in zip(*np.nonzero(score))}

    det = cv2.FastFeatureDetector_create(
        threshold=th, nonmaxSuppression=True,
        type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16,
    )
    kps = det.detect(IMG.astype(np.uint8), None)
    refs = {(int(round(k.pt[0])), int(round(k.pt[1]))) for k in kps}

    assert len(refs) > 30, "test image too bland"
    # count cv2 corners that have one of ours within 1px
    near = 0
    for x, y in refs:
        if any((x + dx, y + dy) in ours for dx in (-1, 0, 1) for dy in (-1, 0, 1)):
            near += 1
    recall = near / len(refs)
    assert recall > 0.9, f"recall vs OpenCV FAST = {recall:.2f}"


def test_extract_end_to_end():
    cfg = ExtractorConfig(n_features=512, n_levels=4)
    feats = extract(jnp.asarray(IMG), cfg)
    n_valid = int(jnp.sum(feats.valid))
    assert feats.xy.shape == (512, 2)
    assert feats.desc.shape == (512, DW)
    assert n_valid > 100, f"only {n_valid} features"
    # valid keypoints must be inside the image
    xy = np.asarray(feats.xy)[np.asarray(feats.valid)]
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 320
    assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 240
    # multiple octaves present
    octs = np.unique(np.asarray(feats.octave)[np.asarray(feats.valid)])
    assert len(octs) >= 2


def test_descriptors_invariant_to_in_plane_rotation():
    """A rotated copy of the image should produce similar descriptors for
    the same physical corners (rotation-aware BRIEF)."""
    cfg = ExtractorConfig(n_features=256, n_levels=1)
    f1 = extract(jnp.asarray(IMG), cfg)

    M = cv2.getRotationMatrix2D((160, 120), 30.0, 1.0)
    rot = cv2.warpAffine(IMG, M, (320, 240), flags=cv2.INTER_LINEAR)
    f2 = extract(jnp.asarray(rot), cfg)

    # map f1 keypoints into rotated frame, find nearest f2 keypoint
    xy1 = np.asarray(f1.xy)
    v1 = np.asarray(f1.valid)
    xy1h = np.hstack([xy1, np.ones((xy1.shape[0], 1))])
    xy1r = xy1h @ M.T
    xy2 = np.asarray(f2.xy)
    v2 = np.asarray(f2.valid)
    d1 = np.asarray(f1.desc)
    d2 = np.asarray(f2.desc)

    dists = []
    rng_dists = []
    rng = np.random.RandomState(0)
    for i in np.nonzero(v1)[0]:
        if not (20 < xy1r[i, 0] < 300 and 20 < xy1r[i, 1] < 220):
            continue
        j = np.argmin(np.sum((xy2 - xy1r[i]) ** 2, axis=1) + 1e9 * (~v2))
        if np.sum((xy2[j] - xy1r[i]) ** 2) < 4.0:
            hd = bin(int.from_bytes(d1[i].tobytes(), "little")
                     ^ int.from_bytes(d2[j].tobytes(), "little")).count("1")
            dists.append(hd)
            k = rng.choice(np.nonzero(v2)[0])
            hr = bin(int.from_bytes(d1[i].tobytes(), "little")
                     ^ int.from_bytes(d2[k].tobytes(), "little")).count("1")
            rng_dists.append(hr)
    assert len(dists) > 20, "not enough repeated corners"
    assert np.median(dists) < 60, f"median match dist {np.median(dists)}"
    assert np.median(dists) < 0.6 * np.median(rng_dists)


def test_hamming_pairwise():
    rng = np.random.RandomState(3)
    a = rng.randint(0, 2**32, (16, DW), np.uint64).astype(np.uint32)
    b = rng.randint(0, 2**32, (24, DW), np.uint64).astype(np.uint32)
    d = np.asarray(hamming.hamming_pairwise(jnp.asarray(a), jnp.asarray(b)))
    # golden: python popcount
    for i in range(16):
        for j in range(0, 24, 7):
            x = int.from_bytes(a[i].tobytes(), "little") ^ int.from_bytes(
                b[j].tobytes(), "little"
            )
            assert d[i, j] == bin(x).count("1")
    assert d.min() >= 0 and d.max() <= NB


def test_masked_min2():
    d = jnp.asarray([[5, 3, 9], [1, 2, 3]], jnp.int32)
    mask = jnp.asarray([[True, True, True], [False, True, True]])
    best, idx, second = hamming.masked_min2(d, mask)
    assert list(np.asarray(best)) == [3, 2]
    assert list(np.asarray(idx)) == [1, 1]
    assert list(np.asarray(second)) == [5, 3]


def test_match_masked_mutual_and_dedup():
    # two descriptors matching the same target: only best row keeps it
    a = jnp.asarray(np.array([[1, 0, 0, 0, 0, 0, 0, 0],
                              [3, 0, 0, 0, 0, 0, 0, 0],
                              [0xFF, 0, 0, 0, 0, 0, 0, 0]], np.uint32))
    b = jnp.asarray(np.array([[1, 0, 0, 0, 0, 0, 0, 0]], np.uint32))
    mask = jnp.ones((3, 1), bool)
    res = matching.match_masked(a, b, mask, max_dist=50, ratio=1.0)
    idx = np.asarray(res.idx)
    assert idx[0] == 0          # exact match wins
    assert idx[1] == -1         # loses dedup to row 0
    assert idx[2] == -1


def test_search_for_initialization_synthetic():
    """Shifted copy of an image: init matcher should find many matches with
    the correct offset."""
    cfg = ExtractorConfig(n_features=512, n_levels=2)
    shift = 8
    img2 = np.roll(IMG, shift, axis=1)
    f1 = extract(jnp.asarray(IMG), cfg)
    f2 = extract(jnp.asarray(img2), cfg)
    res = matching.search_for_initialization(f1, f2, window=50.0)
    idx = np.asarray(res.idx)
    n = (idx >= 0).sum()
    assert n > 50, f"only {n} init matches"
    xy1 = np.asarray(f1.xy)
    xy2 = np.asarray(f2.xy)
    dx = xy2[idx[idx >= 0], 0] - xy1[idx >= 0, 0]
    # most matches should agree with the true shift
    frac = np.mean(np.abs(dx - shift) < 1.5)
    assert frac > 0.8, f"only {frac:.0%} of matches at true shift"
