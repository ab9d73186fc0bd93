"""Driver for TUM RGB-D sequences (the mono_tum.cc / rgbd_tum.cc analog).

Usage:
  python examples/run_tum.py mono  <settings.yaml> <sequence_dir>
  python examples/run_tum.py rgbd  <settings.yaml> <sequence_dir> <assoc.txt>

Emits KeyFrameTrajectory.txt and CameraTrajectory.txt in TUM format and
prints per-frame timing stats like the reference drivers
(Examples/Monocular/mono_tum.cc:56-121).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    mode, settings_path, seq = sys.argv[1], sys.argv[2], sys.argv[3]
    from orb_slam2_annotate_tpu.io import config, datasets, trajectory
    from orb_slam2_annotate_tpu.pipeline import System

    st = config.load_settings(settings_path, sensor=mode)
    slam = System(st.cam, st.slam)

    if mode == "mono":
        samples = datasets.read_tum_mono(seq)
    else:
        samples = datasets.read_tum_rgbd(seq, sys.argv[4])

    # native C++ prefetch pipeline decodes ahead of the device loop
    from orb_slam2_annotate_tpu.io import native_loader
    use_native = native_loader.available() and mode == "mono"
    if use_native:
        pre = native_loader.PrefetchLoader([x.image_path for x in samples])

    times = []
    for i, s in enumerate(samples):
        t0 = time.time()
        if mode == "mono":
            img = pre[i] if use_native else datasets.load_image_gray(s.image_path)
            slam.track_mono(img, s.timestamp)
        else:
            img = datasets.load_image_gray(s.rgb_path)
            import cv2
            d = cv2.imread(s.depth_path, cv2.IMREAD_UNCHANGED)
            depth = d.astype(np.float32) / st.depth_map_factor
            slam.track_rgbd(img, depth, s.timestamp)
        times.append(time.time() - t0)
        if i % 50 == 0:
            print(f"frame {i}/{len(samples)} kf={slam.n_keyframes} "
                  f"mp={slam.n_mappoints} {times[-1]*1e3:.0f} ms")

    trajectory.save_tum(
        "CameraTrajectory.txt",
        [(r.timestamp, T) for r, (fid, T) in
         zip(slam.records, slam.frame_trajectory()) if T is not None],
    )
    ts_of = {r.frame_id: r.timestamp for r in slam.records}
    trajectory.save_tum(
        "KeyFrameTrajectory.txt",
        [(ts_of[fid], T) for fid, T in slam.keyframe_trajectory()
         if fid in ts_of],
    )
    t = sorted(times)
    print(f"median tracking time: {t[len(t)//2]*1e3:.1f} ms; "
          f"mean: {np.mean(times)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
