"""3-D trajectory plotting (host-side matplotlib, optional dependency).

Replaces the reference's end-of-run figure (batch.py:347-360): odometry vs
SLAM trajectory in one 3-D axes, legend, axis labels in metres.
"""

from __future__ import annotations

import numpy as np


def plot_trajectory_3d(
    slam_xyz: np.ndarray,
    odom_xyz: np.ndarray | None = None,
    title: str = "Underwater Visual SLAM Trajectory",
    save_path: str | None = None,
    show: bool = False,
):
    """Returns the matplotlib figure (or None if matplotlib is missing)."""
    try:
        import matplotlib

        if save_path and not show:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover - matplotlib is baked in here
        return None

    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    if odom_xyz is not None:
        o = np.asarray(odom_xyz)
        ax.plot3D(o[:, 0], o[:, 1], o[:, 2], color="orange", linewidth=2, label="Odometry")
    s = np.asarray(slam_xyz)
    ax.plot3D(s[:, 0], s[:, 1], s[:, 2], color="blue", label="Ours (SLAM + Landmarks)")
    ax.legend()
    ax.set_title(title)
    ax.set_xlabel("X (m)")
    ax.set_ylabel("Y (m)")
    ax.set_zlabel("Z (m)")
    if save_path:
        fig.savefig(save_path, dpi=120)
    if show:  # pragma: no cover
        plt.show()
    return fig


def plot_incremental_trajectory(ax, xyz: np.ndarray):  # pragma: no cover
    """Live-updating plot hook for the fixed-lag smoother (the working
    analog of gtsam.utils.plot.plot_incremental_trajectory used by the
    reference's broken isam.py:343-347)."""
    ax.plot3D(xyz[:, 0], xyz[:, 1], xyz[:, 2], color="blue")
    import matplotlib.pyplot as plt

    plt.pause(0.01)
