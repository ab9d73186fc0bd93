"""Driver for EuRoC MAV stereo sequences (stereo_euroc.cc analog).

Usage: python examples/run_euroc_stereo.py <settings.yaml> <mav0_dir> <timestamps.txt>

When the settings file carries LEFT./RIGHT. K/D/R/P blocks (the format of
the reference's Examples/Stereo/EuRoC.yaml), both images are rectified on
device before tracking — the analog of the cv::initUndistortRectifyMap +
cv::remap pass in stereo_euroc.cc:62-90, but as one fused bilinear-gather
program per pair.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    settings_path, seq, ts_file = sys.argv[1], sys.argv[2], sys.argv[3]
    from orb_slam2_annotate_tpu.io import config, datasets, trajectory
    from orb_slam2_annotate_tpu.pipeline import System

    st = config.load_settings(settings_path, sensor="stereo",
                              width=752, height=480)
    slam = System(st.cam, st.slam)
    rectifier = config.load_stereo_rectification(settings_path)
    if rectifier is not None:
        print("rectifying with LEFT./RIGHT. K/D/R/P maps from settings")
    samples = datasets.read_euroc_stereo(seq, ts_file)
    times = []
    for i, s in enumerate(samples):
        il = datasets.load_image_gray(s.left_path)
        ir = datasets.load_image_gray(s.right_path)
        t0 = time.time()
        if rectifier is not None:
            il, ir = rectifier(il, ir)
        slam.track_stereo(il, ir, s.timestamp)
        times.append(time.time() - t0)
        if i % 100 == 0:
            print(f"frame {i}/{len(samples)} kf={slam.n_keyframes} "
                  f"mp={slam.n_mappoints}")
    trajectory.save_tum(
        "CameraTrajectory.txt",
        [(r.timestamp, T) for r, (fid, T) in
         zip(slam.records, slam.frame_trajectory()) if T is not None],
    )
    t = sorted(times)
    print(f"median tracking time: {t[len(t)//2]*1e3:.1f} ms")


if __name__ == "__main__":
    main()
