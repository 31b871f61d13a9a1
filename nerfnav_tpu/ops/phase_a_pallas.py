"""Pallas TPU kernel for the block marcher's phase-A candidate coords.

Chip profile (benchmarks/probe_phase_a.py): phase A costs ~122 ms/frame at
the 800^2 flagship, and ~57 ms of that is the ELEMENTWISE ladder math
(z ladder -> positions -> cascade -> cell -> block row / local bit) — pure
VPU work that XLA splits across many fusion boundaries, each materializing a
(N, T_A)-shaped intermediate to HBM. This kernel fuses the whole chain in
VMEM and writes ONE packed int32 per candidate:

    code = in_range << 22 | block_row << 10 | local_bit

The consumer (ops/marching.py phase A) unpacks with shifts — those unpack
ops fuse into the block test, so total HBM traffic for the ladder becomes
one int32 write + one read per candidate.

Layout: candidates ride the SUBLANE axis (t_a rounds to 8: ~4% padding),
rays ride the LANE axis (128 per grid step). The match to the XLA path is
bit-exact (same fp32 ops), pinned by tests/test_phase_a_pallas.py.

Parity: the geometry replaced here is the reference marcher's per-thread
empty-space-skip loop setup (raymarching.cu:347-404); the block/bit layout
is ops/morton.py pack_blocks.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _kernel(inp_ref, out_ref, *, t_a, t_pad, hc, bc, nb, cascades, bound,
            normalized):
    # inp rows: ox oy oz dx dy dz near dt far (9 used, padded to 16)
    ox = inp_ref[0:1, :]
    oy = inp_ref[1:2, :]
    oz = inp_ref[2:3, :]
    dx = inp_ref[3:4, :]
    dy = inp_ref[4:5, :]
    dz = inp_ref[5:6, :]
    near = inp_ref[6:7, :]
    dt = inp_ref[7:8, :]
    far = inp_ref[8:9, :]
    c_dt = inp_ref[9:10, :].astype(jnp.int32)  # per-ray mip floor from dt

    ti = jax.lax.broadcasted_iota(jnp.int32, (t_pad, _LANES), 0)
    tau = ti.astype(jnp.float32)  # Mosaic iota must be integer-typed
    z = near + tau * dt
    px = ox + dx * z
    py = oy + dy * z
    pz = oz + dz * z

    mx = jnp.maximum(jnp.maximum(jnp.abs(px), jnp.abs(py)), jnp.abs(pz))
    cas = jnp.zeros((t_pad, _LANES), jnp.int32)
    for i in range(cascades - 1):
        cas = cas + (mx > float(2**i)).astype(jnp.int32)
    cas = jnp.minimum(jnp.maximum(cas, c_dt), cascades - 1)
    # cas_bound = min(2^cas, bound) via a static where-chain
    cb = jnp.full((t_pad, _LANES), min(1.0, bound), jnp.float32)
    for i in range(1, cascades):
        cb = jnp.where(cas >= i, min(float(2**i), bound), cb)

    inv = 0.5 / cb
    shift = int(bc).bit_length() - 1
    mask = bc - 1

    def cell(p):
        u = jnp.clip(p * inv + 0.5, 0.0, 1.0 - 1e-6)
        return (u * float(hc)).astype(jnp.int32)

    cx, cy, cz = cell(px), cell(py), cell(pz)
    bx, by, bz = cx >> shift, cy >> shift, cz >> shift
    lx, ly, lz = cx & mask, cy & mask, cz & mask
    flat = cas * (nb**3) + ((bx * nb) + by) * nb + bz
    local = ((lx * bc) + ly) * bc + lz

    zin = (z < far) & (ti < t_a)
    out_ref[:, :] = (
        zin.astype(jnp.int32) << 22 | (flat << 10) | local
    )


def phase_a_coords(rays_o, rays_d, near, dt_a, far, *, t_a, hc, bc,
                   cascades, bound, normalized=True, interpret=False):
    """Packed phase-A candidate codes.

    rays_o, rays_d: (N, 3); near, far: (N,); dt_a: (N,) per-ray ladder step
    (the normalized ladder) or a python float for the fixed ladder.
    Returns codes (N, t_a) int32: zin<<22 | flat<<10 | local, where flat is
    the pack_blocks row (cascade-major) of a (hc, bc)-blocked coarse table
    and local the bit index inside the row. Use unpack_codes().
    """
    n = rays_o.shape[0]
    n_pad = -(-n // _LANES) * _LANES
    t_pad = -(-t_a // 8) * 8
    nb = hc // bc

    if not hasattr(dt_a, "shape") or dt_a.ndim == 0:
        dt_a = jnp.full((n,), dt_a, jnp.float32)
    dt_a = dt_a.reshape(n)

    inp = jnp.zeros((16, n_pad), jnp.float32)
    inp = inp.at[0:3, :n].set(rays_o.T)
    inp = inp.at[3:6, :n].set(rays_d.T)
    inp = inp.at[6, :n].set(near)
    inp = inp.at[7, :n].set(dt_a)
    inp = inp.at[8, :n].set(far)
    # mip floor from the step size (mip_level's c_dt term), per ray
    c_dt = jnp.maximum(
        jnp.ceil(jnp.log2(jnp.maximum(dt_a * hc * 0.5, 1e-9))), 0
    ).astype(jnp.float32)
    inp = inp.at[9, :n].set(c_dt)

    grid = (n_pad // _LANES,)
    codes = pl.pallas_call(
        partial(_kernel, t_a=t_a, t_pad=t_pad, hc=hc, bc=bc, nb=nb,
                cascades=cascades, bound=bound, normalized=normalized),
        grid=grid,
        in_specs=[pl.BlockSpec((16, _LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((t_pad, _LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, n_pad), jnp.int32),
        interpret=interpret,
    )(inp)
    return codes[:t_a, :n].T  # (N, t_a)


def unpack_codes(codes):
    """codes (N, T) int32 -> (flat (N,T) int32, local (N,T) int32,
    zin (N,T) bool). The shifts fuse into the consumer."""
    local = codes & 1023
    flat = (codes >> 10) & 4095
    zin = (codes >> 22) > 0
    return flat, local, zin
