"""Driver for EuRoC MAV sequences (mono_euroc.cc / stereo_euroc.cc analog).

Usage:
  python examples/run_euroc.py mono   <settings.yaml> <mav0_dir> <timestamps.txt>
  python examples/run_euroc.py stereo <settings.yaml> <mav0_dir> <timestamps.txt>

When the settings file carries LEFT./RIGHT. K/D/R/P blocks (the format of
the reference's Examples/Stereo/EuRoC.yaml), both images are rectified on
device before tracking — the analog of the cv::initUndistortRectifyMap +
cv::remap pass in stereo_euroc.cc:62-90, but as one fused bilinear-gather
program per pair.  Mono mode undistorts keypoints analytically inside the
Frame build instead (mono_euroc.cc uses raw images + distortion in YAML).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    mode, settings_path, seq, ts_file = (sys.argv[1], sys.argv[2],
                                         sys.argv[3], sys.argv[4])
    from orb_slam2_annotate_tpu.io import config, datasets, trajectory
    from orb_slam2_annotate_tpu.pipeline import System

    st = config.load_settings(settings_path, sensor=mode,
                              width=752, height=480)
    slam = System(st.cam, st.slam)

    stereo = mode == "stereo"
    rectifier = config.load_stereo_rectification(settings_path) if stereo else None
    if rectifier is not None:
        print("rectifying with LEFT./RIGHT. K/D/R/P maps from settings")
    samples = (datasets.read_euroc_stereo(seq, ts_file) if stereo
               else datasets.read_euroc_mono(seq, ts_file))

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
            if rectifier is not None:
                il, ir = rectifier(il, ir)
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
    print(f"median tracking time: {t[len(t)//2]*1e3:.1f} ms  "
          f"mean: {sum(t)/len(t)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
