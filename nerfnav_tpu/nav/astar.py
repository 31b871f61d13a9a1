"""Grid A* for planner warm-starts.

Capability parity: reference nav/quad_helpers.py:201-258 — 6-connected A*
over a boolean occupancy grid with Euclidean heuristic and heap frontier.

Runs once per plan on the host (the reference's is also host Python). A C++
implementation is available via nerfnav_tpu.native (same signature) and is
used automatically when built; this pure-Python version is the fallback and
golden reference.
"""

import heapq

import numpy as np

_NEIGHBORS = [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)]


def astar_python(occupied: np.ndarray, start, goal):
    """occupied: (H,W,D) bool; start/goal: int index triples.
    Returns list of index triples (inclusive path) or None if unreachable.
    Start/goal must be free (reference asserts, quad_helpers.py:219-220)."""
    occupied = np.asarray(occupied, bool)
    start, goal = tuple(int(c) for c in start), tuple(int(c) for c in goal)
    if occupied[start]:
        raise ValueError(f"A* start cell {start} is occupied")
    if occupied[goal]:
        raise ValueError(f"A* goal cell {goal} is occupied")
    shape = occupied.shape

    def h(c):
        return float(np.linalg.norm(np.subtract(c, goal)))

    open_heap = [(h(start), 0.0, start)]
    came, g_cost = {}, {start: 0.0}
    closed = set()
    while open_heap:
        _, g, cur = heapq.heappop(open_heap)
        if cur == goal:
            path = [cur]
            while cur in came:
                cur = came[cur]
                path.append(cur)
            return path[::-1]
        if cur in closed:
            continue
        closed.add(cur)
        for d in _NEIGHBORS:
            nxt = (cur[0] + d[0], cur[1] + d[1], cur[2] + d[2])
            if not all(0 <= nxt[i] < shape[i] for i in range(3)):
                continue
            if occupied[nxt] or nxt in closed:
                continue
            ng = g + 1.0
            if ng < g_cost.get(nxt, np.inf):
                g_cost[nxt] = ng
                came[nxt] = cur
                heapq.heappush(open_heap, (ng + h(nxt), ng, nxt))
    return None


def astar(occupied, start, goal):
    """Dispatch to the native C++ implementation when available."""
    try:
        from nerfnav_tpu.native import astar_native

        return astar_native(occupied, start, goal)
    except Exception:
        return astar_python(occupied, start, goal)
