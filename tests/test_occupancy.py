import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfnav_tpu.models import NetworkConfig, init_network
from nerfnav_tpu.models.occupancy import (
    OccupancyConfig,
    init_occupancy_state,
    update_extra_state,
    mark_untrained_grid,
    reset_extra_state,
)
from nerfnav_tpu.ops.morton import unpackbits


@pytest.fixture(scope="module")
def net_cfg():
    return NetworkConfig(bound=1.0, grid_levels=4, grid_log2_hashmap_size=10,
                         grid_max_resolution=64)


@pytest.fixture(scope="module")
def params(net_cfg):
    return init_network(jax.random.PRNGKey(0), net_cfg)


@pytest.fixture
def cfg():
    return OccupancyConfig(bound=1.0, grid_size=32, update_chunk=4096)


class TestConfig:
    def test_cascades(self):
        assert OccupancyConfig(bound=1.0).cascades == 1
        assert OccupancyConfig(bound=2.0).cascades == 2
        assert OccupancyConfig(bound=4.0).cascades == 3
        assert OccupancyConfig(bound=8.0).cascades == 4


class TestUpdate:
    def test_full_update_shapes(self, cfg, params, net_cfg):
        state = init_occupancy_state(cfg)
        state = update_extra_state(state, cfg, params, net_cfg, jax.random.PRNGKey(0))
        assert state["density_grid"].shape == (1, 32 ** 3)
        assert state["bitfield"].shape == (1, 32 ** 3 // 8)
        assert int(state["iter_density"]) == 1
        assert float(state["mean_density"]) > 0

    def test_grid_tracks_density(self, cfg, net_cfg):
        """With a synthetic field that is dense only in one octant, the
        bitfield must activate (approximately) only there."""
        # build params whose density is high iff x>0,y>0,z>0: monkeypatch via
        # a fake 'network' isn't needed — craft a table-free check instead by
        # overriding density through a tiny wrapper config is complex; use a
        # real net but verify EMA/threshold mechanics on a hand-set grid.
        state = init_occupancy_state(cfg)
        grid = state["density_grid"].at[0, :100].set(50.0)
        from nerfnav_tpu.models.occupancy import _finish_update

        new = _finish_update(state, cfg, grid, jnp.full_like(grid, -1.0), None)
        # decayed but above threshold -> first 100 cells occupied
        bits = np.asarray(unpackbits(new["bitfield"][0]))
        assert bits[:100].all()
        assert not bits[100:].any()

    def test_untrained_cells_stay_negative(self, cfg, params, net_cfg):
        state = init_occupancy_state(cfg)
        state["density_grid"] = state["density_grid"].at[0, :500].set(-1.0)
        state = update_extra_state(state, cfg, params, net_cfg, jax.random.PRNGKey(0))
        assert np.all(np.asarray(state["density_grid"][0, :500]) < 0)

    def test_partial_update_after_full_phase(self, cfg, params, net_cfg):
        state = init_occupancy_state(cfg)
        state["iter_density"] = jnp.asarray(16, jnp.int32)  # past full phase
        state = update_extra_state(state, cfg, params, net_cfg, jax.random.PRNGKey(1))
        assert int(state["iter_density"]) == 17

    def test_reset(self, cfg):
        state = init_occupancy_state(cfg)
        state["iter_density"] = jnp.asarray(5, jnp.int32)
        state = reset_extra_state(state, cfg)
        assert int(state["iter_density"]) == 0


class TestMarkUntrained:
    def test_camera_frustum_marking(self, cfg):
        state = init_occupancy_state(cfg)
        # one camera at z=-2 looking +z with narrow fov: cells behind it
        # (z < -2) must be marked -1
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -2.0
        intr = jnp.asarray([40.0, 40.0, 16.0, 16.0])  # ~43deg for 32px image
        state = mark_untrained_grid(state, cfg, jnp.asarray(pose[None]), intr, 32, 32)
        grid = np.asarray(state["density_grid"][0]).reshape(32, 32, 32)
        # cell centers with z near -1 and x,y near +-1: outside narrow frustum
        assert grid[0, 0, 0] == -1.0  # corner cell, outside fov
        # cell straight ahead at z=0 center: visible
        assert grid[16, 16, 24] == 0.0


class TestStateStructure:
    def test_init_matches_update_structure(self, cfg, params, net_cfg):
        """The occupancy pytree must keep the SAME structure from init through
        updates: a structure change retraces the jitted train step and makes
        checkpoint-resume templates silently drop leaves."""
        import jax

        init = init_occupancy_state(cfg)
        upd = update_extra_state(init, cfg, params, net_cfg, jax.random.PRNGKey(0))
        assert jax.tree_util.tree_structure(init) == jax.tree_util.tree_structure(upd)


def test_thresh_cap_pins_carve_bar():
    """update_extra_state(thresh_cap=...) must bound the carve threshold:
    cells above the cap stay occupied even when mean_density has risen past
    it (the ratchet that drives the 30k reference-schedule drift), while
    EMA-decay carving still works."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfnav_tpu.models import NetworkConfig, init_network
    from nerfnav_tpu.models.occupancy import (
        OccupancyConfig, _finish_update, init_occupancy_state,
    )

    cfg = OccupancyConfig(bound=1.0, grid_size=8, update_chunk=64)
    st = init_occupancy_state(cfg)
    grid = st["density_grid"]
    # synthetic sweep: half the cells very dense, a marginal band at 1.5
    n = grid.shape[1]
    tmp = jnp.zeros_like(grid)
    tmp = tmp.at[0, : n // 2].set(100.0)
    tmp = tmp.at[0, n // 2 : n // 2 + 32].set(1.5)
    out = _finish_update(st, cfg, grid, tmp, None)
    # mean ~ 50 -> thresh = min(mean, density_thresh=10) = 10: the marginal
    # band is carved by the reference rule
    occ = np.unpackbits(np.asarray(out["bitfield"][0]))
    assert occ[: n // 2].all() and not occ[n // 2 : n // 2 + 32].any()
    # pinned bar below the band keeps it occupied
    out2 = _finish_update(st, cfg, grid, tmp, None,
                          thresh_cap=jnp.float32(1.0))
    occ2 = np.unpackbits(np.asarray(out2["bitfield"][0]))
    assert occ2[: n // 2].all() and occ2[n // 2 : n // 2 + 32].all()
    # zero-density cells stay carved regardless
    assert not occ2[n // 2 + 32 :].any()


def test_occ_hysteresis_sticky_carve():
    """occ_hysteresis: a cell already occupied stays on down to
    hysteresis * thresh; a cell never occupied needs the full threshold —
    boundary flicker between sweeps is suppressed (round-4 drift arm)."""
    from nerfnav_tpu.models.occupancy import _finish_update

    cfg = OccupancyConfig(bound=1.0, grid_size=8, update_chunk=64,
                          occ_hysteresis=0.5)
    st = init_occupancy_state(cfg)
    grid = st["density_grid"]
    n = grid.shape[1]
    tmp = jnp.zeros_like(grid)
    tmp = tmp.at[0, : n // 2].set(100.0)
    # marginal band between 0.5*thresh and thresh (thresh = 10 here)
    tmp = tmp.at[0, n // 2 : n // 2 + 32].set(7.0)
    out = _finish_update(st, cfg, grid, tmp, None)
    occ = np.unpackbits(np.asarray(out["bitfield"][0]))
    # never-occupied marginal cells stay off (full threshold to turn on)
    assert occ[: n // 2].all() and not occ[n // 2 : n // 2 + 32].any()
    # second sweep from a state where the band IS on: it sticks
    st2 = dict(out)
    out2 = _finish_update(st2, cfg, out["density_grid"], tmp, None)
    occ2 = np.unpackbits(np.asarray(out2["bitfield"][0]))
    assert occ2[: n // 2].all() and not occ2[n // 2 : n // 2 + 32].any()
    # force the band on, then drop its density into the hysteresis window
    from nerfnav_tpu.ops.morton import packbits as pb

    forced = occ.copy()
    forced[n // 2 : n // 2 + 32] = 1
    st3 = dict(out)
    st3["bitfield"] = jnp.asarray(np.packbits(forced, bitorder="little"))[None]
    out3 = _finish_update(st3, cfg, out["density_grid"], tmp, None)
    occ3 = np.unpackbits(np.asarray(out3["bitfield"][0]), bitorder="little")
    assert occ3[n // 2 : n // 2 + 32].all()  # sticky: 7.0 > 0.5 * 10
    # but a density below the hysteresis bar DOES carve
    tmp4 = tmp.at[0, n // 2 : n // 2 + 32].set(3.0)
    out4 = _finish_update(st3, cfg, grid, tmp4, None)
    occ4 = np.unpackbits(np.asarray(out4["bitfield"][0]), bitorder="little")
    assert not occ4[n // 2 : n // 2 + 32].any()


def test_density_write_clamp_bounds_accretion():
    """density_write_clamp (round-5 growth-clamp arm): fresh sweep values
    are clamped at clamp*density_thresh before the EMA, so junk spikes
    cannot inflate mean_density or buy ~50 sweeps of decay immunity —
    while occupancy decisions stay identical (clamp value > thresh)."""
    from nerfnav_tpu.models.occupancy import _finish_update

    cfg = OccupancyConfig(bound=1.0, grid_size=8, update_chunk=64,
                          density_write_clamp=2.0)
    ref = OccupancyConfig(bound=1.0, grid_size=8, update_chunk=64)
    st = init_occupancy_state(cfg)
    grid = st["density_grid"]
    n = grid.shape[1]
    tmp = jnp.zeros_like(grid)
    tmp = tmp.at[0, : n // 4].set(500.0)     # junk spike
    tmp = tmp.at[0, n // 4 : n // 2].set(12.0)
    out = _finish_update(st, cfg, grid, tmp, None)
    out_ref = _finish_update(st, ref, grid, tmp, None)
    # stored value bounded at 2 * density_thresh = 20
    assert float(out["density_grid"].max()) <= 2.0 * cfg.density_thresh + 1e-6
    assert float(out_ref["density_grid"].max()) == 500.0
    # occupancy decisions identical (both bands stay above every bar)
    assert np.array_equal(np.asarray(out["bitfield"]),
                          np.asarray(out_ref["bitfield"]))
    # the carve-bar statistic tracks the RAW sweep (reference dynamics):
    # clamping the store must not lower min(mean, thresh) — a post-clamp
    # mean floods occupancy with junk cells (chip: -4 dB from epoch 1)
    assert abs(float(out["mean_density"])
               - float(out_ref["mean_density"])) < 1e-5
    # decay immunity shortened: with no fresh writes, the spike cell falls
    # below thresh within log(thresh/clamp)/log(decay) ~ 14 sweeps instead
    # of ~76 for the unclamped 500
    g = out["density_grid"]
    for _ in range(15):
        o = _finish_update(st, cfg, g, jnp.full_like(g, -1.0), None)
        g = o["density_grid"]
    assert float(g[0, 0]) < cfg.density_thresh


def test_ema_toward_query_debounces_outliers():
    """ema_toward_query (round-5 growth-clamp arm B): a single high
    jittered outlier no longer pins a cell (mean-EMA tracks the query
    stream); persistently dense cells still activate within 2 sweeps."""
    from nerfnav_tpu.models.occupancy import _finish_update

    cfg = OccupancyConfig(bound=1.0, grid_size=8, update_chunk=64,
                          ema_toward_query=True)
    ref = OccupancyConfig(bound=1.0, grid_size=8, update_chunk=64)
    st = init_occupancy_state(cfg)
    grid = st["density_grid"]
    n = grid.shape[1]
    # dense background keeps the carve bar at the density_thresh cap (10):
    # half the cells queried at 100 every sweep
    base = jnp.zeros_like(grid).at[0, n // 2 :].set(100.0)
    # sweep 1: cell 0 sees a single 300 outlier query
    spike = base.at[0, 0].set(300.0)
    out = _finish_update(st, cfg, grid, spike, None)
    out_ref = _finish_update(st, ref, grid, spike, None)
    # toward-query writes only (1-decay)*300 = 15; max-EMA pins 300
    assert abs(float(out["density_grid"][0, 0]) - 15.0) < 1e-4
    assert float(out_ref["density_grid"][0, 0]) == 300.0
    # subsequent sweeps query the cell at 0: toward-query carves it within
    # ~log(10/15)/log(0.95) ~ 8 sweeps; max-EMA needs ~66 from 300
    zero = base.at[0, 0].set(0.0)
    g, g_ref = out["density_grid"], out_ref["density_grid"]
    for _ in range(10):
        out = _finish_update(st, cfg, g, zero, None)
        g = out["density_grid"]
        out_ref = _finish_update(st, ref, g_ref, zero, None)
        g_ref = out_ref["density_grid"]
    occ = np.unpackbits(np.asarray(out["bitfield"][0]), bitorder="little")
    occ_ref = np.unpackbits(np.asarray(out_ref["bitfield"][0]),
                            bitorder="little")
    assert not occ[0]      # debounced: the outlier no longer pins the cell
    assert occ_ref[0]      # max-EMA still pinned after 10 sweeps
    # persistently dense cells activate and stay on under toward-query
    assert occ[n // 2 :].all()
    # unsampled cells still see decay-all semantics
    g2 = jnp.zeros_like(grid).at[0, 1].set(8.0)
    out2 = _finish_update(st, cfg, g2, jnp.full_like(grid, -1.0), None)
    assert abs(float(out2["density_grid"][0, 1]) - 8.0 * cfg.decay) < 1e-5


def test_occ_debounce_two_observation_activation():
    """occ_debounce (round-5 arm C): an inactive cell activates only after
    two CONSECUTIVE observed-high sweeps; one jittered outlier pins the
    EMA (max memory untouched) but never the bitfield; active cells and
    carving follow the reference rule unchanged."""
    from nerfnav_tpu.models.occupancy import _finish_update

    cfg = OccupancyConfig(bound=1.0, grid_size=8, update_chunk=64,
                          occ_debounce=True)
    st = init_occupancy_state(cfg)
    assert st["pending"].shape == st["density_grid"].shape
    grid = st["density_grid"]
    n = grid.shape[1]
    # dense background pins the bar at the density_thresh cap
    base = jnp.zeros_like(grid).at[0, n // 2 :].set(100.0)
    # sweep 1: background + cell 0 high -> NOTHING active yet (pending)
    spike = base.at[0, 0].set(300.0)
    out = _finish_update(st, cfg, grid, spike, None)
    occ = np.unpackbits(np.asarray(out["bitfield"][0]), bitorder="little")
    assert not occ.any()
    assert bool(out["pending"][0, 0]) and np.asarray(out["pending"][0, n//2:]).all()
    # sweep 2, background high again, cell 0 queried LOW (outlier was one-
    # off): background activates (2 consecutive), cell 0 does not — even
    # though its max-EMA value (300*decay) is far above the bar
    st2 = {**st, **out}
    out2 = _finish_update(st2, cfg, out["density_grid"], base, None)
    occ2 = np.unpackbits(np.asarray(out2["bitfield"][0]), bitorder="little")
    assert occ2[n // 2 :].all()
    assert not occ2[0]
    assert float(out2["density_grid"][0, 0]) > 100.0  # EMA memory intact
    # pending cleared for cell 0 (observed low)
    assert not bool(out2["pending"][0, 0])
    # sweeps 3-4: cell 0 high twice consecutively -> activates
    st3 = {**st, **out2}
    out3 = _finish_update(st3, cfg, out2["density_grid"], spike, None)
    st4 = {**st, **out3}
    out4 = _finish_update(st4, cfg, out3["density_grid"], spike, None)
    occ4 = np.unpackbits(np.asarray(out4["bitfield"][0]), bitorder="little")
    assert occ4[0]
    # carving unchanged: with the background bar held at the cap, cell 0's
    # queries drop to zero and EMA decay carves it exactly like the
    # reference rule (no stickiness was added on the off direction)
    g = out4["density_grid"]
    stx = {**st, **out4}
    for _ in range(70):
        o = _finish_update(stx, cfg, g, base, None)
        g = o["density_grid"]
        stx = {**st, **o}
    occx = np.unpackbits(np.asarray(o["bitfield"][0]), bitorder="little")
    assert not occx[0] and occx[n // 2 :].all()
    # unsampled pending persists until the next observation
    st5 = {**st, **out}          # cell 0 pending from sweep 1
    unsampled = jnp.full_like(grid, -1.0)
    o5 = _finish_update(st5, cfg, out["density_grid"], unsampled, None)
    assert bool(o5["pending"][0, 0])
