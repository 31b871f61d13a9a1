"""Navigation visualization tests (reference quad_helpers.py:109-183 QuadPlot,
estimator_helpers.py:263-283 triptych) — headless Agg rendering to disk."""

import numpy as np

import matplotlib

matplotlib.use("Agg")

from nerfnav_tpu.nav.planner import Planner, PlannerConfig
from nerfnav_tpu.nav.viz import QuadPlot, estimator_triptych


def make_state(pos):
    s = np.zeros(18, np.float32)
    s[0:3] = pos
    s[6:15] = np.eye(3).reshape(-1)
    return s


def test_quadplot_from_planner(tmp_path):
    import jax.numpy as jnp

    cfg = PlannerConfig(T=6, dt=0.1)
    planner = Planner(
        make_state((-0.5, 0, 0.2)), make_state((0.5, 0, 0.2)), cfg,
        density_fn=lambda x: jnp.zeros(x.shape[0]),
    )
    qp = QuadPlot()
    qp.trajectory(planner, color="g")
    qp.plot_data(np.arange(5), np.arange(5) ** 2, label="cost")
    qp.plot_data(np.arange(5), np.arange(5), right=True)
    out = qp.save(tmp_path / "traj.png")
    qp.close()
    assert out.exists() and out.stat().st_size > 0


def test_quadplot_accepts_states_dict(tmp_path):
    out = {
        "pos": np.linspace([0, 0, 0], [1, 1, 1], 8),
        "rot": np.broadcast_to(np.eye(3), (7, 3, 3)),
    }
    qp = QuadPlot(body_points=np.zeros((4, 3)))
    qp.trajectory(out, color="b", show_cloud=True)
    p = qp.save(tmp_path / "dict.png")
    qp.close()
    assert p.exists()


def test_estimator_triptych(tmp_path):
    rng = np.random.default_rng(0)
    gt = rng.random((32, 48, 3)).astype(np.float32)
    render = rng.random((32, 48, 3)).astype(np.float32)
    poi = np.array([[5, 7], [20, 15], [47, 31]])  # [x, y]
    path = tmp_path / "trip.png"
    estimator_triptych(gt, render, poi, title="step 3", path=path)
    assert path.exists() and path.stat().st_size > 0


def test_triptych_marks_keypoints_green():
    gt = np.zeros((16, 16, 3), np.float32)
    fig = estimator_triptych(gt, gt.copy(), np.array([[4, 9]]))
    # the gt panel's image should have the keypoint painted pure green
    img = fig.axes[0].images[0].get_array()
    assert np.allclose(img[9, 4], [0, 1, 0])
    import matplotlib.pyplot as plt

    plt.close(fig)
