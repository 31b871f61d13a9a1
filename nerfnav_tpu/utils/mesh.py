"""Density-field mesh extraction + OBJ/PLY export.

Capability parity: reference nerf/utils.py `extract_geometry` (152-182) and
`Trainer.save_mesh` (533-553), which use pymcubes + trimesh. Neither package
exists in this environment, so iso-surfacing is implemented here directly as
vectorized **marching tetrahedra** (each voxel split into 6 tets; 16-case
tables are tiny, unlike marching cubes' 256-entry tables) with linear edge
interpolation, and the writers emit OBJ/PLY text directly.
"""

import os

import numpy as np

# Cube corner offsets, index = bit order (x<<2 | y<<1 | z)
_CORNERS = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], np.int64
)

# 6-tetrahedra decomposition of the cube (all share the 0-7 diagonal)
_TETS = np.array(
    [[0, 5, 1, 7], [0, 1, 3, 7], [0, 3, 2, 7],
     [0, 2, 6, 7], [0, 6, 4, 7], [0, 4, 5, 7]], np.int64
)

# For a tet with corner mask m (bit i = corner i inside), the surface crosses
# the edges listed below; triangles are emitted with vertices on those edges.
# Cases with one corner in (or out): 1 triangle; two-in/two-out: 2 triangles.
_TET_EDGES = {
    0b0001: [(0, 1), (0, 2), (0, 3)],
    0b1110: [(0, 1), (0, 3), (0, 2)],
    0b0010: [(1, 0), (1, 3), (1, 2)],
    0b1101: [(1, 0), (1, 2), (1, 3)],
    0b0100: [(2, 0), (2, 1), (2, 3)],
    0b1011: [(2, 0), (2, 3), (2, 1)],
    0b1000: [(3, 0), (3, 2), (3, 1)],
    0b0111: [(3, 0), (3, 1), (3, 2)],
    0b0011: [(0, 2), (0, 3), (1, 3), (1, 3), (1, 2), (0, 2)],
    0b1100: [(0, 2), (1, 3), (0, 3), (1, 3), (0, 2), (1, 2)],
    0b0101: [(0, 1), (2, 3), (0, 3), (0, 1), (2, 1), (2, 3)],
    0b1010: [(0, 1), (0, 3), (2, 3), (0, 1), (2, 3), (2, 1)],
    0b0110: [(1, 0), (1, 3), (2, 3), (1, 0), (2, 3), (2, 0)],
    0b1001: [(1, 0), (2, 3), (1, 3), (1, 0), (2, 0), (2, 3)],
}


def marching_tetrahedra(values: np.ndarray, level: float):
    """values: (X, Y, Z) scalar field -> (verts (V,3) in index coords,
    faces (F,3) int). Vectorized over all cube-tets at once."""
    values = np.asarray(values, np.float32)
    nx, ny, nz = values.shape
    cx, cy, cz = nx - 1, ny - 1, nz - 1
    base = np.stack(
        np.meshgrid(np.arange(cx), np.arange(cy), np.arange(cz), indexing="ij"),
        axis=-1,
    ).reshape(-1, 1, 3)  # (C, 1, 3)

    pa_all, pb_all = [], []
    corner_pos = base + _CORNERS[None]  # (C, 8, 3)
    corner_val = values[
        corner_pos[..., 0], corner_pos[..., 1], corner_pos[..., 2]
    ]  # (C, 8)

    for tet in _TETS:
        pos = corner_pos[:, tet]   # (C, 4, 3)
        val = corner_val[:, tet]   # (C, 4)
        inside = val > level
        mask = (
            inside[:, 0].astype(np.int64)
            | (inside[:, 1] << 1)
            | (inside[:, 2] << 2)
            | (inside[:, 3] << 3)
        )
        for case, edges in _TET_EDGES.items():
            sel = np.flatnonzero(mask == case)
            if len(sel) == 0:
                continue
            # (S, 3*ntri, 3): vertex-triples in face-major order
            pa_all.append(np.stack([pos[sel, a] for a, _ in edges], 1).reshape(-1, 3))
            pb_all.append(np.stack([pos[sel, b] for _, b in edges], 1).reshape(-1, 3))

    if not pa_all:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    pa = np.concatenate(pa_all)  # (3F, 3) int lattice endpoints
    pb = np.concatenate(pb_all)

    # Each surface vertex lies on a lattice edge (pa, pb). Canonicalize the
    # pair order (lexicographic) so the interpolated position is BITWISE
    # identical no matter which tet emitted it — dedup on the integer edge
    # key is then exact (coordinate rounding would leave cracks).
    swap = (
        (pa[:, 0] > pb[:, 0])
        | ((pa[:, 0] == pb[:, 0]) & (pa[:, 1] > pb[:, 1]))
        | ((pa[:, 0] == pb[:, 0]) & (pa[:, 1] == pb[:, 1]) & (pa[:, 2] > pb[:, 2]))
    )
    pa2 = np.where(swap[:, None], pb, pa)
    pb2 = np.where(swap[:, None], pa, pb)
    va = values[pa2[:, 0], pa2[:, 1], pa2[:, 2]]
    vb = values[pb2[:, 0], pb2[:, 1], pb2[:, 2]]
    t = (level - va) / np.where(np.abs(vb - va) < 1e-12, 1e-12, vb - va)
    t = np.clip(t, 0.0, 1.0)[:, None]
    flat = pa2 * (1 - t) + pb2 * t

    keys = np.concatenate([pa2, pb2], axis=-1)
    _, idx, inv = np.unique(keys, axis=0, return_index=True, return_inverse=True)
    verts = flat[idx]
    faces = inv.reshape(-1, 3)
    # drop degenerate faces
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts.astype(np.float32), faces[ok]


def extract_geometry(density_fn, bound: float, resolution: int = 256,
                     threshold: float = 10.0, chunk: int = 2 ** 16):
    """Sweep the density field on a grid and iso-surface it
    (reference utils.py:152-182). density_fn: (N,3)->(N,) jittable."""
    import jax
    import jax.numpy as jnp

    lin = np.linspace(-bound, bound, resolution, dtype=np.float32)
    grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
    f = jax.jit(density_fn)
    out = []
    for i in range(0, grid.shape[0], chunk):
        g = grid[i : i + chunk]
        pad = (-g.shape[0]) % chunk
        gp = np.pad(g, ((0, pad), (0, 0)))
        out.append(np.asarray(f(jnp.asarray(gp)))[: g.shape[0]])
    field = np.concatenate(out).reshape(resolution, resolution, resolution)
    verts, faces = marching_tetrahedra(field, threshold)
    # index coords -> world
    scale = 2 * bound / (resolution - 1)
    verts = verts * scale - bound
    return verts, faces, field


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in faces + 1:  # OBJ is 1-indexed
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")


def save_ply(path: str, verts: np.ndarray, faces: np.ndarray):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        for v in verts:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in faces:
            f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")
