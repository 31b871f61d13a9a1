"""Planner tests against analytic density fields (the reference's own dev
pattern, quad_plot.py:442-443: get_manual_nerf("empty"/"cylinder"))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfnav_tpu.nav.astar import astar_python
from nerfnav_tpu.nav.planner import (
    Planner,
    PlannerConfig,
    calc_everything,
)


def empty_density(x):
    return jnp.zeros(x.shape[0])


def cylinder_density(x, radius=0.3, sigma=100.0, sharpness=30.0):
    """Vertical cylinder through the origin with a soft (sigmoid) boundary —
    matching a trained NeRF's smooth density, so collision gradients exist."""
    d = jnp.sqrt(jnp.sum(x[:, :2] ** 2, axis=-1) + 1e-12)
    return sigma * jax.nn.sigmoid((radius - d) * sharpness)


def make_state(pos, vel=(0, 0, 0)):
    s = np.zeros(18, np.float32)
    s[0:3] = pos
    s[3:6] = vel
    s[6:15] = np.eye(3).reshape(-1)
    return s


@pytest.fixture
def cfg():
    return PlannerConfig(T=12, dt=0.1, epochs_init=300, epochs_update=50,
                         astar_fine=40, astar_coarse=20)


class TestAstar:
    def test_straight_line(self):
        occ = np.zeros((10, 10, 10), bool)
        path = astar_python(occ, (0, 0, 0), (9, 0, 0))
        assert path is not None
        assert path[0] == (0, 0, 0) and path[-1] == (9, 0, 0)
        assert len(path) == 10

    def test_routes_around_wall(self):
        occ = np.zeros((10, 10, 10), bool)
        occ[5, :, :] = True
        occ[5, 9, :] = False  # gap at y=9
        path = astar_python(occ, (0, 0, 0), (9, 0, 0))
        assert path is not None
        assert any(c[1] == 9 for c in path)  # went through the gap

    def test_unreachable(self):
        occ = np.zeros((10, 10, 10), bool)
        occ[5, :, :] = True  # full wall
        assert astar_python(occ, (0, 0, 0), (9, 0, 0)) is None

    def test_occupied_start_raises(self):
        occ = np.zeros((4, 4, 4), bool)
        occ[0, 0, 0] = True
        with pytest.raises(ValueError):
            astar_python(occ, (0, 0, 0), (3, 3, 3))


class TestFlatness:
    def test_shapes(self, cfg):
        start = make_state([-0.7, 0, 0.1])
        end = make_state([0.7, 0, 0.1])
        states = jnp.zeros((cfg.T, 4))
        out = calc_everything(jnp.asarray(start), jnp.asarray(end), states,
                              jnp.asarray([10.0, 10.0]), cfg)
        assert out["pos"].shape == (cfg.T + 5, 3)
        assert out["rot"].shape == (cfg.T + 4, 3, 3)
        assert out["actions"].shape == (cfg.T + 2, 4)

    def test_start_continuity(self, cfg):
        """pos[0], vel[0], rot[0] reproduce the start state (reference
        asserts allclose(actions[:2,0], initial_accel), quad_plot.py:207-210)."""
        start = make_state([-0.7, 0.1, 0.1], vel=(0.1, 0.0, 0.0))
        end = make_state([0.7, 0, 0.1])
        states = jnp.asarray(np.random.default_rng(0).normal(size=(cfg.T, 4)) * 0.1,
                             jnp.float32)
        ia = jnp.asarray([10.0, 10.0])
        out = calc_everything(jnp.asarray(start), jnp.asarray(end), states, ia, cfg)
        np.testing.assert_allclose(np.asarray(out["pos"][0]), start[0:3], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["vel"][0]), start[3:6], atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["rot"][0]),
                                   start[6:15].reshape(3, 3), atol=1e-5)
        # first thrust equals m * |R e3 * ia[0]| = ia[0] for identity R
        np.testing.assert_allclose(float(out["actions"][0, 0]), 10.0, rtol=1e-4)

    def test_hover_trajectory_cost_is_gravity_only(self, cfg):
        """Stationary start=end: optimal actions are hover thrust."""
        p = [0.0, 0.0, 0.2]
        start = make_state(p)
        end = make_state(p)
        states = jnp.concatenate(
            [jnp.tile(jnp.asarray(p)[None], (cfg.T, 1)), jnp.zeros((cfg.T, 1))], -1
        )
        out = calc_everything(jnp.asarray(start), jnp.asarray(end), states,
                              jnp.asarray([10.0, 10.0]), cfg)
        np.testing.assert_allclose(np.asarray(out["actions"][:, 0]), 10.0, atol=1e-2)
        np.testing.assert_allclose(np.asarray(out["actions"][:, 1:]), 0.0, atol=1e-3)

    def test_rotations_orthonormal(self, cfg):
        start = make_state([-0.7, 0, 0.1])
        end = make_state([0.7, 0, 0.1])
        states = jnp.asarray(
            np.random.default_rng(1).normal(size=(cfg.T, 4)) * 0.2, jnp.float32
        )
        out = calc_everything(jnp.asarray(start), jnp.asarray(end), states,
                              jnp.asarray([10.0, 10.0]), cfg)
        R = np.asarray(out["rot"])
        for i in range(R.shape[0]):
            np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-4)


class TestPlanner:
    def test_astar_init_avoids_cylinder(self, cfg):
        start = make_state([-0.7, 0.0, 0.1])
        end = make_state([0.7, 0.0, 0.1])
        planner = Planner(start, end, cfg, cylinder_density)
        planner.a_star_init()
        wp = np.asarray(planner.states[:, :3])
        # waypoints clear the cylinder (coarse-cell padded)
        assert np.min(np.linalg.norm(wp[:, :2], axis=-1)) > 0.2

    def test_learn_init_reduces_cost_and_avoids_obstacle(self, cfg):
        start = make_state([-0.7, 0.0, 0.1])
        end = make_state([0.7, 0.0, 0.1])
        planner = Planner(start, end, cfg, cylinder_density)
        planner.a_star_init()
        losses = planner.learn_init()
        assert losses[-1] < losses[0]
        # final trajectory stays out of the cylinder
        out = planner.get_full_states()
        pos = np.asarray(out["pos"])
        body_r = 0.08  # body half-diagonal margin
        assert np.min(np.linalg.norm(pos[:, :2], axis=-1)) > 0.3 - body_r

    def test_empty_field_stays_in_plane(self, cfg):
        """Without obstacles the solution is a ballistic arc in the xz plane
        (thrust^2 favors freefall); y must stay untouched and the arc bounded."""
        start = make_state([-0.5, 0.0, 0.1])
        end = make_state([0.5, 0.0, 0.1])
        planner = Planner(start, end, cfg, empty_density)
        losses = planner.learn_init()
        assert losses[-1] < losses[0]
        pos = np.asarray(planner.get_full_states()["pos"])
        assert np.abs(pos[:, 1]).max() < 0.05
        assert np.abs(pos[:, 2] - 0.1).max() < 0.4
        # endpoints pinned
        np.testing.assert_allclose(pos[0], [-0.5, 0, 0.1], atol=1e-5)
        np.testing.assert_allclose(pos[-1], [0.5, 0, 0.1], atol=1e-5)

    def test_mpc_update_state(self, cfg):
        """Static-horizon (default) MPC: arrays keep their T_max shape, the
        live count drops, and the compiled replan program is reused."""
        start = make_state([-0.5, 0.0, 0.1])
        end = make_state([0.5, 0.0, 0.1])
        planner = Planner(start, end, cfg, empty_density)
        planner.learn_update(iteration=0)  # builds self._step
        step0 = planner._step
        t0 = planner.states.shape[0]
        est = np.zeros(12, np.float32)
        est[0:3] = [-0.4, 0.01, 0.1]
        planner.update_state(est)
        assert planner.states.shape[0] == t0       # shape is static
        assert planner.active == t0 - 1            # one waypoint popped
        assert planner._step is step0              # no retrace scheduled
        np.testing.assert_allclose(np.asarray(planner.start_state[0:3]),
                                   [-0.4, 0.01, 0.1], atol=1e-6)
        losses = planner.learn_update(iteration=1)
        assert np.isfinite(losses[-1])
        # trimmed rollup exposes exactly the live horizon
        out = planner.get_full_states()
        assert out["pos"].shape[0] == planner.active + 5
        assert out["actions"].shape[0] == planner.active + 2
        np.testing.assert_allclose(np.asarray(out["pos"][-1]),
                                   [0.5, 0, 0.1], atol=1e-5)

    def test_mpc_legacy_shrink(self, cfg):
        """static_horizon=False reproduces the reference's pop-and-shrink."""
        import dataclasses

        cfg = dataclasses.replace(cfg, static_horizon=False)
        start = make_state([-0.5, 0.0, 0.1])
        end = make_state([0.5, 0.0, 0.1])
        planner = Planner(start, end, cfg, empty_density)
        t0 = planner.states.shape[0]
        est = np.zeros(12, np.float32)
        est[0:3] = [-0.4, 0.01, 0.1]
        planner.update_state(est)
        assert planner.states.shape[0] == t0 - 1
        assert planner.cfg.T == t0 - 1
        losses = planner.learn_update(iteration=1)
        assert np.isfinite(losses[-1])

    def test_static_horizon_matches_legacy(self, cfg):
        """With one waypoint popped, the static-horizon loss and trajectory
        equal the legacy shrunk-array computation on the live rows."""
        import dataclasses

        from nerfnav_tpu.nav.planner import body_points, total_cost

        rng = np.random.RandomState(0)
        start = jnp.asarray(make_state([-0.4, 0.01, 0.1], vel=(0.3, 0, 0)))
        end = jnp.asarray(make_state([0.5, 0.0, 0.1]))
        T = cfg.T
        states = jnp.asarray(
            np.concatenate(
                [np.linspace([-0.4, 0, 0.1], [0.45, 0, 0.1], T)
                 + rng.randn(T, 3) * 0.01,
                 rng.randn(T, 1) * 0.05], axis=-1), jnp.float32)
        ia = jnp.asarray([cfg.g * 1.1, cfg.g * 0.9], jnp.float32)
        body = body_points(cfg)

        # legacy: horizon T-1 on the popped array
        cfg_small = dataclasses.replace(cfg, T=T - 1)
        loss_ref, out_ref = total_cost(
            start, end, states[1:], ia, cylinder_density, cfg_small, body)
        # static: full array rolled left, active = T-1
        rolled = jnp.roll(states, -1, axis=0)
        loss_st, out_st = total_cost(
            start, end, rolled, ia, cylinder_density, cfg, body,
            active=T - 1)
        np.testing.assert_allclose(float(loss_st), float(loss_ref),
                                   rtol=1e-5)
        a = T - 1
        for key, n in [("pos", a + 5), ("vel", a + 5), ("accel", a + 4),
                       ("rot", a + 4), ("omega", a + 3), ("actions", a + 2)]:
            np.testing.assert_allclose(
                np.asarray(out_st[key][:n]), np.asarray(out_ref[key]),
                atol=1e-5,
                err_msg=f"{key} diverges between static and legacy modes")

    def test_static_horizon_fade_matches_legacy(self, cfg):
        """End-to-end with a progressive collision fade (fade_out_epoch > 0):
        after one MPC pop, static and legacy optimizations must follow the
        same loss trajectory — the fade front scales with the LIVE horizon,
        not T_max."""
        import dataclasses

        cfg = dataclasses.replace(cfg, T=6, fade_out_epoch=40,
                                  epochs_update=20, save_every=10)
        start = make_state([-0.5, 0.0, 0.1])
        end = make_state([0.5, 0.0, 0.1])
        est = np.zeros(12, np.float32)
        est[0:3] = [-0.42, 0.01, 0.1]

        def run(static):
            c = dataclasses.replace(cfg, static_horizon=static)
            pl = Planner(start, end, c, cylinder_density)
            pl.update_state(est)
            return pl.learn_update(0)

        losses_static, losses_legacy = run(True), run(False)
        np.testing.assert_allclose(losses_static, losses_legacy, rtol=2e-4)

    def test_load_progress_across_horizon_modes(self, cfg, tmp_path):
        """A static-horizon progress file must not leak its dead tail rows
        into a legacy planner (and a legacy file pads back up for static)."""
        import dataclasses

        start = make_state([-0.5, 0.0, 0.1])
        end = make_state([0.5, 0.0, 0.1])
        est = np.zeros(12, np.float32)
        est[0:3] = [-0.45, 0.0, 0.1]

        pl_static = Planner(start, end, cfg, empty_density)
        pl_static.update_state(est)
        pl_static.update_state(est)  # 2 pops: active = T-2, 2 dead tail rows
        path = str(tmp_path / "prog.npz")
        pl_static.save_progress(path)

        legacy_cfg = dataclasses.replace(cfg, static_horizon=False)
        pl_legacy = Planner(start, end, legacy_cfg, empty_density)
        pl_legacy.load_progress(path)
        assert pl_legacy.states.shape[0] == cfg.T - 2
        assert pl_legacy.cfg.T == cfg.T - 2
        np.testing.assert_allclose(
            np.asarray(pl_legacy.states),
            np.asarray(pl_static.states[: cfg.T - 2]), atol=1e-6)

        # round-trip: the legacy planner's file loads back into static mode
        path2 = str(tmp_path / "prog2.npz")
        pl_legacy.save_progress(path2)
        pl_static2 = Planner(start, end, cfg, empty_density)
        pl_static2.load_progress(path2)
        assert pl_static2.states.shape[0] == cfg.T   # padded back to T_max
        assert pl_static2.active == cfg.T - 2
        # trimmed rollups agree
        out_a = pl_legacy.get_full_states()
        out_b = pl_static2.get_full_states()
        np.testing.assert_allclose(np.asarray(out_a["pos"]),
                                   np.asarray(out_b["pos"]), atol=1e-5)

    def test_artifacts_written(self, cfg, tmp_path):
        start = make_state([-0.5, 0.0, 0.1])
        end = make_state([0.5, 0.0, 0.1])
        planner = Planner(start, end, cfg, empty_density,
                          workspace=str(tmp_path), exp_name="t")
        planner.learn_init()
        import os

        assert os.path.exists(tmp_path / "init_poses" / "t" / "init_0.json")
        assert os.path.exists(tmp_path / "init_costs" / "t" / "init_0.json")

    def test_save_load_progress(self, cfg, tmp_path):
        start = make_state([-0.5, 0.0, 0.1])
        end = make_state([0.5, 0.0, 0.1])
        planner = Planner(start, end, cfg, empty_density)
        planner.save_progress(str(tmp_path / "prog.npz"))
        p2 = Planner(start, end, cfg, empty_density)
        p2.load_progress(str(tmp_path / "prog.npz"))
        np.testing.assert_allclose(np.asarray(p2.states), np.asarray(planner.states))
