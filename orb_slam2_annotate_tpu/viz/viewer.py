"""Host-side visualization (the L7 layer: Viewer/FrameDrawer/MapDrawer).

The reference renders with Pangolin/OpenGL on a dedicated thread
(Viewer.cc:55-151, MapDrawer.cc:44-231, FrameDrawer.cc:41-166); none of
that is perf-critical, so here it is a small matplotlib module that can
snapshot the functional MapState at any time — no threading needed, the
map is just a value.
"""

from __future__ import annotations

import numpy as np


def draw_frame(image, frame, obs, path: str | None = None):
    """FrameDrawer::DrawFrame analog: keypoints over the image; tracked
    map points green, untracked features faint."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(np.asarray(image), cmap="gray", vmin=0, vmax=255)
    xy = np.asarray(frame.xy_raw)
    v = np.asarray(frame.valid)
    tracked = np.asarray(obs) >= 0
    ax.scatter(xy[v & ~tracked, 0], xy[v & ~tracked, 1], s=6,
               facecolors="none", edgecolors="#ffcc00", linewidths=0.5)
    ax.scatter(xy[v & tracked, 0], xy[v & tracked, 1], s=10,
               facecolors="none", edgecolors="#00dd44", linewidths=0.9)
    ax.set_title(f"{int((v & tracked).sum())} tracked / {int(v.sum())} features")
    ax.axis("off")
    if path:
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig


def draw_map(m, trajectory=None, path: str | None = None, elev=-75, azim=-90):
    """MapDrawer analog: 3D map points, keyframe frusta (as axes), the
    covisibility graph, and optionally the frame trajectory."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..worldmap import map_state as ms

    fig = plt.figure(figsize=(9, 7))
    ax = fig.add_subplot(111, projection="3d")

    mp = np.asarray(m.mp_pos)[np.asarray(m.mp_valid)]
    if len(mp):
        ax.scatter(mp[:, 0], mp[:, 1], mp[:, 2], s=1, c="k", alpha=0.4)

    kf_valid = np.asarray(m.kf_valid)
    kf_R = np.asarray(m.kf_R)
    kf_t = np.asarray(m.kf_t)
    centers = {}
    for s in np.nonzero(kf_valid)[0]:
        c = -kf_R[s].T @ kf_t[s]
        centers[s] = c
        z = kf_R[s].T @ np.array([0, 0, 0.15])
        ax.plot([c[0], c[0] + z[0]], [c[1], c[1] + z[1]], [c[2], c[2] + z[2]],
                c="b", lw=1)
        ax.scatter(*c, s=14, c="b")

    # covisibility edges (KeyFrame covisibility graph, green like the ref)
    W = np.asarray(ms.covisibility(m))
    for a in centers:
        for b in centers:
            if a < b and W[a, b] >= 15:
                ca, cb = centers[a], centers[b]
                ax.plot([ca[0], cb[0]], [ca[1], cb[1]], [ca[2], cb[2]],
                        c="g", lw=0.4, alpha=0.5)

    if trajectory is not None:
        tr = np.asarray(trajectory)
        ax.plot(tr[:, 0], tr[:, 1], tr[:, 2], c="r", lw=1.2)

    ax.view_init(elev=elev, azim=azim)
    ax.set_title(f"{len(mp)} map points / {kf_valid.sum()} keyframes")
    if path:
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig
