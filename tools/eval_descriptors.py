"""Descriptor-quality evaluation + threshold tuning.

Measures the matched-vs-random Hamming distance distributions of the
CURRENT BRIEF pattern (ops/orb.py) on ground-truth correspondences from
the textured synthetic scenes, and prints suggested TH_LOW / TH_HIGH
(reference constants 50/100 were tuned to OpenCV's pattern,
ORBmatcher.cc:37-39; ours must come from our own pattern's statistics —
VERDICT r1 item 3).

Usage: python tools/eval_descriptors.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp


def main():
    from orb_slam2_annotate_tpu.geometry import CameraModel
    from orb_slam2_annotate_tpu.io import synthetic
    from orb_slam2_annotate_tpu.ops import extractor as ex
    from orb_slam2_annotate_tpu.ops.hamming import hamming_pairwise

    cam = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                             width=320, height=240)
    cfg = ex.ExtractorConfig(n_features=512, n_levels=4)
    poses = synthetic.orbit_trajectory(6, step=0.06)

    matched, random_d = [], []
    for seed in range(6):
        scene = (synthetic.PlaneScene(seed=seed) if seed % 2 == 0
                 else synthetic.BlobScene(seed=seed))
        Ra, ta = poses[0]
        Rb, tb = poses[4]
        img_a, dep_a = scene.render(cam, Ra, ta, h=240, w=320)
        img_b, _ = scene.render(cam, Rb, tb, h=240, w=320)
        fa = ex.extract(jnp.asarray(img_a.astype(np.float32)), cfg)
        fb = ex.extract(jnp.asarray(img_b.astype(np.float32)), cfg)
        xa = np.asarray(fa.xy)
        va = np.asarray(fa.valid)
        xb = np.asarray(fb.xy)
        vb = np.asarray(fb.valid)
        da = np.asarray(fa.desc)
        db = np.asarray(fb.desc)
        xb_pred, okc = synthetic.true_correspondence(cam, Ra, ta, Rb, tb,
                                                    dep_a, xa)
        D = np.asarray(hamming_pairwise(jnp.asarray(da), jnp.asarray(db)))
        for i in np.nonzero(va & okc)[0]:
            d2 = ((xb - xb_pred[i]) ** 2).sum(1) + 1e9 * (~vb)
            j = int(np.argmin(d2))
            if d2[j] > 4.0:
                continue
            matched.append(D[i, j])
            # random: same query vs a far-away valid feature
            far = np.nonzero(vb & (((xb - xb_pred[i]) ** 2).sum(1) > 900))[0]
            if len(far):
                random_d.append(D[i, far[len(far) // 2]])

    matched = np.asarray(matched)
    random_d = np.asarray(random_d)
    print(f"matched pairs: {len(matched)}, random pairs: {len(random_d)}")
    for name, arr in [("matched", matched), ("random", random_d)]:
        q = np.percentile(arr, [5, 25, 50, 75, 95])
        print(f"{name:8s} p5={q[0]:5.0f} p25={q[1]:5.0f} p50={q[2]:5.0f} "
              f"p75={q[3]:5.0f} p95={q[4]:5.0f}")
    # TH_LOW: accept ~85% of true matches while staying left of the random
    # p5; TH_HIGH: ~95% acceptance bound for the loose matchers
    th_low = int(min(np.percentile(matched, 85), np.percentile(random_d, 5) - 8))
    th_high = int(min(np.percentile(matched, 97), np.percentile(random_d, 25)))
    print(f"suggested TH_LOW={th_low} TH_HIGH={th_high} "
          f"(current: see ops/matching.py)")


if __name__ == "__main__":
    main()
