"""Device-mesh sharding for data-parallel training and rendering.

Capability parity: the reference's distributed story (SURVEY.md 2.3) is
torch DDP + NCCL all_reduce/all_gather scaffolding (nerf/utils.py:267-268,
305-307, 866-882), never actually launched. The TPU-native equivalent needs
no separate communication subsystem: rays are sharded over a 1-D `Mesh`
("data" axis) with `jax.sharding` annotations inside the jitted train step;
XLA SPMD inserts the gradient all-reduce over ICI automatically (the psum
the reference would have done via NCCL).

The one shared mutable structure — the occupancy grid — is updated by a
data-parallel density sweep whose cell batch is likewise sharded; the
EMA-max merge is elementwise, so no collective beyond the implicit ones is
needed (SURVEY.md 5 design note).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first n devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (ray/batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def shard_rays(tree, mesh: Mesh, axis: str = "data"):
    """Constrain every leaf's leading axis to be sharded across the mesh —
    applied INSIDE jit so XLA SPMD partitions all downstream field/render
    compute and psums gradients over ICI."""
    spec = P(axis)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec)),
        tree,
    )
