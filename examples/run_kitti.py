"""Driver for KITTI odometry sequences (mono_kitti.cc / stereo_kitti.cc
analog).

Usage:
  python examples/run_kitti.py mono   <settings.yaml> <sequence_dir>
  python examples/run_kitti.py stereo <settings.yaml> <sequence_dir>

Emits CameraTrajectory.txt in KITTI format (System.cc:424-477) and
KeyFrameTrajectory.txt in TUM format, and prints per-frame timing stats
like the reference drivers (mono_kitti.cc:56-121).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    mode, settings_path, seq = sys.argv[1], sys.argv[2], sys.argv[3]
    from orb_slam2_annotate_tpu.io import config, datasets, trajectory
    from orb_slam2_annotate_tpu.pipeline import System

    st = config.load_settings(settings_path, sensor=mode,
                              width=1241, height=376)
    slam = System(st.cam, st.slam)

    stereo = mode == "stereo"
    samples = (datasets.read_kitti_stereo(seq) if stereo
               else datasets.read_kitti_mono(seq))

    # native C++ prefetch pipeline decodes ahead of the device loop
    from orb_slam2_annotate_tpu.io import native_loader
    use_native = native_loader.available()
    if use_native:
        left = native_loader.PrefetchLoader(
            [s.left_path if stereo else s.image_path for s in samples])
        if stereo:
            right = native_loader.PrefetchLoader(
                [s.right_path for s in samples])

    times = []
    for i, s in enumerate(samples):
        if stereo:
            il = left[i] if use_native else datasets.load_image_gray(s.left_path)
            ir = right[i] if use_native else datasets.load_image_gray(s.right_path)
            t0 = time.time()
            slam.track_stereo(il, ir, s.timestamp)
        else:
            img = left[i] if use_native else datasets.load_image_gray(s.image_path)
            t0 = time.time()
            slam.track_mono(img, s.timestamp)
        times.append(time.time() - t0)
        if i % 100 == 0:
            print(f"frame {i}/{len(samples)} kf={slam.n_keyframes} "
                  f"mp={slam.n_mappoints}")
    slam.flush()

    trajectory.save_kitti(
        "CameraTrajectory.txt",
        [T for _, T in slam.frame_trajectory() if T is not None],
    )
    ts_of = {r.frame_id: r.timestamp for r in slam.records}
    trajectory.save_tum(
        "KeyFrameTrajectory.txt",
        [(ts_of[fid], T) for fid, T in slam.keyframe_trajectory()
         if fid in ts_of],
    )
    t = sorted(times)
    print(f"median tracking time: {t[len(t)//2]*1e3:.1f} ms  "
          f"mean: {sum(t)/len(t)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
