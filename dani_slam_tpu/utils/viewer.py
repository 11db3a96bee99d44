"""Map/frame visualization (host-side).

Reference: the Pangolin-based Viewer/FrameDrawer/MapDrawer threads
(src/Viewer.cc — map window with camera follow + menu, src/FrameDrawer.cc —
keypoint overlays incl. YOLO boxes, src/MapDrawer.cc — GL map points,
keyframes, covisibility graph). SURVEY.md §2.3 scopes the TPU rebuild to
host-side rendering: matplotlib figures (interactive or saved to files), no
GL dependency. All drawing pulls the functional MapState once per render —
there is no per-field locking to replicate.
"""
from __future__ import annotations

import numpy as np


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def draw_map(st, trajectory=None, path: str = None, show_covis: bool = True,
             elev: float = -60, azim: float = -90):
    """Render map points + keyframes (+ covisibility graph + trajectory).
    Returns the figure; saves to `path` if given (reference: MapDrawer
    DrawMapPoints/DrawKeyFrames/DrawCurrentCamera)."""
    plt = _mpl()
    fig = plt.figure(figsize=(9, 7))
    ax = fig.add_subplot(111, projection="3d")

    lm_mask = np.asarray(st.lm_mask)
    pts = np.asarray(st.lm_pos)[lm_mask]
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.5, c="k", alpha=0.4,
                   label=f"{len(pts)} landmarks")

    kf_mask = np.asarray(st.kf_mask)
    kf_ids = np.nonzero(kf_mask)[0]
    R = np.asarray(st.kf_R)
    t = np.asarray(st.kf_t)
    centers = {k: -R[k].T @ t[k] for k in kf_ids}
    if kf_ids.size:
        C = np.stack([centers[k] for k in kf_ids])
        ax.scatter(C[:, 0], C[:, 1], C[:, 2], s=25, c="tab:blue", marker="^",
                   label=f"{len(kf_ids)} keyframes")

    if show_covis and kf_ids.size:
        covis = np.asarray(st.covis)
        for i in kf_ids:
            for j in kf_ids:
                if j > i and covis[i, j] > 30:
                    a, b = centers[i], centers[j]
                    ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]],
                            c="tab:green", lw=0.4, alpha=0.5)

    if trajectory:
        Cs = np.stack([-np.asarray(Rc).T @ np.asarray(tc)
                       for (_, Rc, tc) in trajectory])
        ax.plot(Cs[:, 0], Cs[:, 1], Cs[:, 2], c="tab:red", lw=1.2,
                label="trajectory")

    ax.legend(loc="upper left", fontsize=8)
    ax.view_init(elev=elev, azim=azim)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
    return fig


def draw_frame(img, xy, valid, bindings=None, boxes=None, box_mask=None,
               state: str = "", path: str = None):
    """Current-frame overlay: keypoints (green = bound to a landmark,
    blue = unmatched), YOLO dynamic boxes (reference: FrameDrawer::DrawFrame
    + the Viewer's detection-box overlay, src/Viewer.cc:341-352)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(8, 6))
    img = np.asarray(img)
    ax.imshow(img, cmap="gray" if img.ndim == 2 else None)
    xy = np.asarray(xy)
    valid = np.asarray(valid)
    if bindings is not None:
        bound = (np.asarray(bindings) >= 0) & valid
        free = valid & ~bound
        ax.scatter(xy[bound, 0], xy[bound, 1], s=12, marker="s",
                   facecolors="none", edgecolors="lime", linewidths=0.8)
        ax.scatter(xy[free, 0], xy[free, 1], s=8, c="deepskyblue", marker=".")
        n_tracked = int(bound.sum())
    else:
        ax.scatter(xy[valid, 0], xy[valid, 1], s=8, c="lime", marker=".")
        n_tracked = int(valid.sum())
    if boxes is not None:
        from matplotlib.patches import Rectangle
        for b, ok in zip(np.asarray(boxes), np.asarray(box_mask)):
            if ok:
                ax.add_patch(Rectangle((b[0], b[1]), b[2] - b[0],
                                       b[3] - b[1], fill=False,
                                       edgecolor="red", linewidth=1.2))
    ax.set_title(f"{state}   tracked: {n_tracked}")
    ax.axis("off")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
    return fig
