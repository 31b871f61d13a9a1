"""Native C++ A* vs the Python golden implementation."""

import numpy as np
import pytest

from nerfnav_tpu.nav.astar import astar_python

try:
    from nerfnav_tpu.native import astar_native

    _load_err = None
    astar_native(np.zeros((2, 2, 2), bool), (0, 0, 0), (1, 1, 1))
except Exception as e:  # toolchain may be absent
    _load_err = e
    astar_native = None

pytestmark = pytest.mark.skipif(
    astar_native is None, reason=f"native build unavailable: {_load_err}"
)


def test_matches_python_on_random_mazes():
    rng = np.random.default_rng(0)
    for trial in range(5):
        occ = rng.random((12, 12, 12)) < 0.25
        occ[0, 0, 0] = occ[11, 11, 11] = False
        p_py = astar_python(occ, (0, 0, 0), (11, 11, 11))
        p_cc = astar_native(occ, (0, 0, 0), (11, 11, 11))
        if p_py is None:
            assert p_cc is None
        else:
            assert p_cc is not None
            # both optimal: same length; endpoints equal; all cells free
            assert len(p_cc) == len(p_py)
            assert p_cc[0] == (0, 0, 0) and p_cc[-1] == (11, 11, 11)
            assert not any(occ[c] for c in p_cc)
            # steps are 6-connected
            d = np.abs(np.diff(np.asarray(p_cc), axis=0)).sum(axis=1)
            assert (d == 1).all()


def test_occupied_start_raises():
    occ = np.zeros((4, 4, 4), bool)
    occ[0, 0, 0] = True
    with pytest.raises(ValueError):
        astar_native(occ, (0, 0, 0), (3, 3, 3))


def test_unreachable():
    occ = np.zeros((8, 8, 8), bool)
    occ[4, :, :] = True
    assert astar_native(occ, (0, 0, 0), (7, 0, 0)) is None


def test_speed_on_planner_scale_grid():
    """The planner's 20^3 maxpooled grid — native path should be instant."""
    import time

    occ = np.zeros((20, 20, 20), bool)
    occ[10, 5:15, :] = True
    t0 = time.perf_counter()
    for _ in range(50):
        astar_native(occ, (0, 10, 10), (19, 10, 10))
    dt = (time.perf_counter() - t0) / 50
    assert dt < 0.05, dt
