"""Host-side visualization (the L7 layer: Viewer/FrameDrawer/MapDrawer).

The reference renders with Pangolin/OpenGL on a dedicated thread
(Viewer.cc:55-151, MapDrawer.cc:44-231, FrameDrawer.cc:41-166); none of
that is perf-critical, so here it is a small matplotlib module that can
snapshot the functional MapState at any time — no threading needed, the
map is just a value.
"""

from __future__ import annotations

import numpy as np




def draw_frame_into(ax, image, frame, obs, extra_title: str = ""):
    """Render the FrameDrawer panel into an existing axes (shared by
    draw_frame and InteractiveViewer so the styling cannot drift)."""
    if image is not None:
        ax.imshow(np.asarray(image), cmap="gray", vmin=0, vmax=255)
    if frame is not None:
        xy = np.asarray(frame.xy_raw)
        v = np.asarray(frame.valid)
        tracked = (np.asarray(obs) >= 0) if obs is not None else (
            np.zeros(len(xy), bool))
        ax.scatter(xy[v & ~tracked, 0], xy[v & ~tracked, 1], s=6,
                   facecolors="none", edgecolors="#ffcc00", linewidths=0.5)
        ax.scatter(xy[v & tracked, 0], xy[v & tracked, 1], s=10,
                   facecolors="none", edgecolors="#00dd44", linewidths=0.9)
        ax.set_title(f"{int((v & tracked).sum())} tracked / "
                     f"{int(v.sum())} features" + extra_title)
    ax.axis("off")

def draw_frame(image, frame, obs, path: str | None = None):
    """FrameDrawer::DrawFrame analog: keypoints over the image; tracked
    map points green, untracked features faint."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    draw_frame_into(ax, image, frame, obs)
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


class InteractiveViewer:
    """Viewer::Run analog (Viewer.cc:55-151): a live two-panel display —
    current frame with tracked features (FrameDrawer) and the 3D map
    with keyframes/covisibility/trajectory (MapDrawer) — refreshed every
    `every` frames, with the reference's GUI menu as keyboard toggles:

        f  follow camera           (menuFollowCamera)
        p  show points             (menuShowPoints)
        k  show keyframes          (menuShowKeyFrames)
        g  show covisibility graph (menuShowGraph)
        l  localization mode       (menuLocalizationMode -> System)
        r  reset                   (menuReset -> System.reset)
        q  close the viewer

    Works headless too (matplotlib Agg): update() renders into the
    figure without a window, and the toggles are plain attributes so
    drivers/tests can flip them programmatically.  The reference runs
    this on a std::thread at camera rate; the functional map makes that
    unnecessary — the viewer just snapshots the current MapState value
    whenever update() is called.
    """

    def __init__(self, system=None, every: int = 5, follow: bool = True):
        import matplotlib
        import matplotlib.pyplot as plt

        self.system = system
        self.every = max(1, every)
        self.follow = follow
        self.show_points = True
        self.show_keyframes = True
        self.show_graph = True
        self.localization_mode = False
        self.closed = False
        self._n = 0
        self._interactive = matplotlib.get_backend().lower() not in (
            "agg", "pdf", "svg", "ps")
        self.fig = plt.figure(figsize=(13, 6))
        self.ax_img = self.fig.add_subplot(1, 2, 1)
        self.ax_map = self.fig.add_subplot(1, 2, 2, projection="3d")
        self.fig.canvas.mpl_connect("key_press_event", self._on_key)
        if self._interactive:
            plt.ion()
            self.fig.show()

    # -- GUI menu (keyboard) ------------------------------------------

    def _on_key(self, event):
        k = (event.key or "").lower()
        if k == "f":
            self.follow = not self.follow
        elif k == "p":
            self.show_points = not self.show_points
        elif k == "k":
            self.show_keyframes = not self.show_keyframes
        elif k == "g":
            self.show_graph = not self.show_graph
        elif k == "l":
            self.localization_mode = not self.localization_mode
            if self.system is not None:
                if self.localization_mode:
                    self.system.activate_localization_mode()
                else:
                    self.system.deactivate_localization_mode()
        elif k == "r" and self.system is not None:
            self.system.reset()
        elif k == "q":
            self.closed = True

    # -- per-frame update ---------------------------------------------

    def update(self, image=None, frame=None, obs=None, m=None,
               pose=None, force: bool = False):
        """Refresh both panels.  Call once per tracked frame; renders
        every `self.every` calls (rendering dominates frame time
        otherwise — the reference throttles to camera fps the same way,
        Viewer.cc:179)."""
        from ..worldmap import map_state as ms

        self._n += 1
        if self.closed or (self._n % self.every and not force):
            return False
        if m is None and self.system is not None:
            m = self.system.map
        if pose is None and self.system is not None:
            pose = (np.asarray(self.system.R), np.asarray(self.system.t))

        # ---- frame panel (shared renderer with draw_frame)
        ax = self.ax_img
        ax.clear()
        draw_frame_into(
            ax, image, frame, obs,
            extra_title="  [LOC]" if self.localization_mode else "")

        # ---- map panel
        axm = self.ax_map
        axm.clear()
        if m is not None:
            if self.show_points:
                mp = np.asarray(m.mp_pos)[np.asarray(m.mp_valid)]
                if len(mp):
                    axm.scatter(mp[:, 0], mp[:, 1], mp[:, 2], s=1, c="k",
                                alpha=0.35)
            kf_valid = np.asarray(m.kf_valid)
            kf_R = np.asarray(m.kf_R)
            kf_t = np.asarray(m.kf_t)
            centers = {}
            for s in np.nonzero(kf_valid)[0]:
                centers[s] = -kf_R[s].T @ kf_t[s]
            if self.show_keyframes and centers:
                cs = np.stack(list(centers.values()))
                axm.scatter(cs[:, 0], cs[:, 1], cs[:, 2], s=12, c="b")
            if self.show_graph and len(centers) > 1:
                W = np.asarray(ms.covisibility(m))
                ks = list(centers)
                for i, a in enumerate(ks):
                    for b in ks[i + 1:]:
                        if W[a, b] >= 15:
                            ca, cb = centers[a], centers[b]
                            axm.plot([ca[0], cb[0]], [ca[1], cb[1]],
                                     [ca[2], cb[2]], c="g", lw=0.4,
                                     alpha=0.5)
            if pose is not None:
                R, t = pose
                c = -np.asarray(R).T @ np.asarray(t)
                axm.scatter(*c, s=40, c="r", marker="^")
                if self.follow:
                    # follow-camera: center the view on the current pose
                    r = 2.0
                    axm.set_xlim(c[0] - r, c[0] + r)
                    axm.set_ylim(c[1] - r, c[1] + r)
                    axm.set_zlim(c[2] - r, c[2] + r)
            axm.set_title(
                f"{int(np.asarray(m.mp_valid).sum())} pts / "
                f"{int(kf_valid.sum())} KFs")
        if self._interactive:
            self.fig.canvas.draw_idle()
            self.fig.canvas.flush_events()
        else:
            self.fig.canvas.draw()
        return True

    def savefig(self, path: str):
        self.fig.savefig(path, dpi=100, bbox_inches="tight")

    def close(self):
        import matplotlib.pyplot as plt

        self.closed = True
        plt.close(self.fig)
