"""Tests for the stereo frame path: rectified pair -> per-feature depth."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_annotate_tpu.geometry import CameraModel
from orb_slam2_annotate_tpu.io import synthetic
from orb_slam2_annotate_tpu.ops.extractor import ExtractorConfig
from orb_slam2_annotate_tpu.pipeline.frame import make_frame_stereo

BASELINE = 0.35
CAM = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                         bf=250.0 * BASELINE, width=320, height=240)


def test_stereo_matching_recovers_depth():
    scene = synthetic.PlaneScene(seed=3)
    R = np.eye(3, dtype=np.float32)
    t_l = np.zeros(3, np.float32)
    # right camera displaced +baseline along x (world -> right cam)
    t_r = np.array([-BASELINE, 0.0, 0.0], np.float32)
    img_l, dep_l = scene.render(CAM, R, t_l, h=240, w=320)
    img_r, _ = scene.render(CAM, R, t_r, h=240, w=320)

    cfg = ExtractorConfig(n_features=512, n_levels=4)
    fr = make_frame_stereo(jnp.asarray(img_l), jnp.asarray(img_r), CAM, cfg)

    v = np.asarray(fr.valid)
    d = np.asarray(fr.depth)
    xy = np.asarray(fr.xy)
    has = v & (d > 0)
    assert has.sum() > 100, f"only {has.sum()} stereo matches"

    # compare against the rendered depth at each matched keypoint
    xi = np.clip(np.round(xy[has, 0]).astype(int), 0, 319)
    yi = np.clip(np.round(xy[has, 1]).astype(int), 0, 239)
    gt = dep_l[yi, xi]
    ok = gt > 0.3
    rel = np.abs(d[has][ok] - gt[ok]) / gt[ok]
    # most matches should be within 5% depth (subpixel-free disparity at
    # 4-9 m with 0.12 m baseline has limited precision)
    assert np.median(rel) < 0.05, f"median depth error {np.median(rel):.3f}"
    assert (rel < 0.15).mean() > 0.8, f"{(rel < 0.15).mean():.2%} within 15%"


def test_stereo_ur_consistency():
    scene = synthetic.PlaneScene(seed=3)
    R = np.eye(3, dtype=np.float32)
    img_l, _ = scene.render(CAM, R, np.zeros(3, np.float32), h=240, w=320)
    img_r, _ = scene.render(CAM, R, np.array([-BASELINE, 0, 0], np.float32),
                            h=240, w=320)
    cfg = ExtractorConfig(n_features=512, n_levels=4)
    fr = make_frame_stereo(jnp.asarray(img_l), jnp.asarray(img_r), CAM, cfg)
    v = np.asarray(fr.valid) & (np.asarray(fr.depth) > 0)
    ur = np.asarray(fr.ur)[v]
    u = np.asarray(fr.xy)[v, 0]
    d = np.asarray(fr.depth)[v]
    np.testing.assert_allclose(ur, u - float(CAM.bf) / d, atol=1e-3)
