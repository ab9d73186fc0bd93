"""Driver for KITTI odometry stereo sequences (stereo_kitti.cc analog).

Usage: python examples/run_kitti_stereo.py <settings.yaml> <sequence_dir>
Emits CameraTrajectory.txt in KITTI format (System.cc:424-477).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    settings_path, seq = sys.argv[1], sys.argv[2]
    from orb_slam2_annotate_tpu.io import config, datasets, trajectory
    from orb_slam2_annotate_tpu.pipeline import System

    st = config.load_settings(settings_path, sensor="stereo",
                              width=1241, height=376)
    slam = System(st.cam, st.slam)
    samples = datasets.read_kitti_stereo(seq)
    # native C++ prefetch pipeline decodes ahead of the device loop
    from orb_slam2_annotate_tpu.io import native_loader
    use_native = native_loader.available()
    if use_native:
        left = native_loader.PrefetchLoader([x.left_path for x in samples])
        right = native_loader.PrefetchLoader([x.right_path for x in samples])
    times = []
    for i, s in enumerate(samples):
        if use_native:
            il, ir = left[i], right[i]
        else:
            il = datasets.load_image_gray(s.left_path)
            ir = datasets.load_image_gray(s.right_path)
        t0 = time.time()
        slam.track_stereo(il, ir, s.timestamp)
        times.append(time.time() - t0)
        if i % 100 == 0:
            print(f"frame {i}/{len(samples)} kf={slam.n_keyframes} "
                  f"mp={slam.n_mappoints}")
    trajectory.save_kitti(
        "CameraTrajectory.txt",
        [T for _, T in slam.frame_trajectory() if T is not None],
    )
    t = sorted(times)
    print(f"median tracking time: {t[len(t)//2]*1e3:.1f} ms")


if __name__ == "__main__":
    main()
