"""Matplotlib navigation visualizations.

Capability parity: reference nav/quad_helpers.py `QuadPlot` (109-183) — a
3-D map axis showing the trajectory line, the swept robot body point cloud,
and per-state RGB axis triads, plus a twin-axis data graph — and the
estimator's gt/features/render triptych debug figure
(nav/estimator_helpers.py:263-283).

Headless-first: the Agg backend is forced when no display is present, and
every figure can be written to disk with `.save(path)` (the reference calls
`plt.show()` / `plt.pause(1)` interactively). Matplotlib is imported lazily
so the nav stack itself never depends on it.
"""

import os

import numpy as np


def _plt():
    import matplotlib

    if not os.environ.get("DISPLAY"):
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def _body_to_world(out, points):
    """Sweep (P, 3) body points through calc_everything states -> (S, P, 3)
    (reference quad_plot.py:217-222)."""
    rot = np.asarray(out["rot"])              # (S, 3, 3)
    pos = np.asarray(out["pos"])[: rot.shape[0]]
    return np.einsum("sij,pj->spi", rot, np.asarray(points)) + pos[:, None, :]


class QuadPlot:
    """3-D trajectory + body-cloud + axis-triad plot with a data graph
    (reference quad_helpers.py:109-183).

    `trajectory` accepts either a Planner (nav/planner.py) or a
    calc_everything output dict ({"pos", "rot", ...}).
    """

    def __init__(self, body_points=None):
        plt = _plt()
        self.fig = plt.figure(figsize=(16, 8))
        self.ax_map = self.fig.add_subplot(1, 2, 1, projection="3d")
        self.ax_graph = self.fig.add_subplot(1, 2, 2)
        self.ax_graph_right = self.ax_graph.twinx()
        if body_points is None:
            # reference body cloud: 10 x 10 x 5 lattice (quad_helpers.py:117-121)
            xs = np.linspace(-0.05, 0.05, 10)
            zs = np.linspace(-0.02, 0.02, 5)
            body_points = np.stack(
                np.meshgrid(xs, xs, zs, indexing="ij"), axis=-1
            ).reshape(-1, 3)
        self.robot_body = np.asarray(body_points, np.float32)
        self.fig.tight_layout()

    @staticmethod
    def _states_of(traj):
        if isinstance(traj, dict):
            return traj
        return traj.get_full_states()

    def trajectory(self, traj, color="g", show_cloud=True):
        out = {k: np.asarray(v) for k, v in self._states_of(traj).items()}
        ax = self.ax_map
        pos = np.asarray(out["pos"])
        ax.plot(pos[:, 0], pos[:, 1], pos[:, 2], color if isinstance(color, str) else "g")

        if show_cloud:
            cloud = _body_to_world(out, self.robot_body)      # (S, P, 3)
            for i, state_body in enumerate(cloud):
                c = (color[i] if isinstance(color, (list, tuple)) else color)
                ax.plot(
                    state_body[:, 0], state_body[:, 1], state_body[:, 2],
                    c + ".", ms=72.0 / ax.figure.dpi, alpha=0.5,
                )

        # per-state RGB axis triads (quad_helpers.py:150-162)
        size = 0.05
        triad = np.array(
            [[0, 0, 0], [size, 0, 0], [0, size, 0], [0, 0, size]], np.float32
        )
        world = _body_to_world(out, triad)                    # (S, 4, 3)
        for state_axis in world:
            for i, c in enumerate("rgb", start=1):
                seg = state_axis[[0, i]]
                ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], c=c)
        return self

    def plot_data(self, *args, right=False, **kwargs):
        (self.ax_graph_right if right else self.ax_graph).plot(*args, **kwargs)
        return self

    def save(self, path):
        self.fig.savefig(path, dpi=100)
        return path

    def show(self):
        _plt().show()

    def close(self):
        _plt().close(self.fig)


def estimator_triptych(
    gt_img, render_img, poi_xy=None, title=None, path=None
):
    """Ground-truth / features / render debug figure
    (reference estimator_helpers.py:263-283): keypoint pixels are painted
    green on both the observation and the render; the middle panel shows the
    keypoint mask. Returns the figure (saved + closed when `path` given).

    The reference draws this every `render_rate` gradient steps inside the
    pose-optimization loop; here the whole loop is one on-device `lax.scan`
    (nav/estimator.py), so the triptych is drawn once per filter update at
    the posterior pose.
    """
    plt = _plt()
    gt = np.array(gt_img, np.float32, copy=True)
    rd = np.array(render_img, np.float32, copy=True)
    if gt.max() > 1.5:
        gt = gt / 255.0
    if rd.max() > 1.5:
        rd = rd / 255.0
    feats = np.zeros(gt.shape[:2], np.float32)
    if poi_xy is not None and len(poi_xy):
        xy = np.asarray(poi_xy, np.int64)
        x = np.clip(xy[:, 0], 0, gt.shape[1] - 1)
        y = np.clip(xy[:, 1], 0, gt.shape[0] - 1)
        green = np.array([0.0, 1.0, 0.0], np.float32)
        gt[y, x] = green
        rd[y, x] = green
        feats[y, x] = 1.0

    fig, axarr = plt.subplots(1, 3, figsize=(15, 5))
    if title:
        fig.suptitle(title)
    for ax, img, name in zip(
        axarr, (gt, feats, rd), ("Ground Truth", "Features", "NeRF Render")
    ):
        ax.imshow(img, cmap=None if img.ndim == 3 else "gray")
        ax.set_title(name)
        ax.axis("off")
    if path:
        fig.savefig(path, dpi=100)
        plt.close(fig)
    return fig
