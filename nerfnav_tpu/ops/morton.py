"""Morton (Z-order) codes and occupancy bit-packing.

Capability parity: reference raymarching/src/raymarching.cu —
`morton3D` (58-68), `morton3D_invert` (70-83, 216-262), `packbits` (269-302).

TPU-native design: the magic-number bit-interleave is pure vectorized integer
VPU math (no kernel needed). `packbits` packs 8 consecutive occupancy bools
per byte via a reshape + dot with bit weights — one fused XLA op chain.

Note on layout: the CUDA marcher indexes its bitfield in Morton order for
warp locality (raymarching.cu:372-382). Our grid/bitfield use row-major
(x*H + y)*H + z order — on TPU both are equally random for HBM gathers and
row-major keeps index math fused; Morton ops are still provided for API
parity and for tooling that wants Z-order traversals.
"""

import jax.numpy as jnp
import numpy as np


def _expand_bits(v):
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
    v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
    v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
    v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
    return v


def morton3d(coords):
    """coords: (..., 3) uint32/int32 in [0, 1024) -> (...,) uint32 Morton codes."""
    c = coords.astype(jnp.uint32)
    x = _expand_bits(c[..., 0])
    y = _expand_bits(c[..., 1])
    z = _expand_bits(c[..., 2])
    return x | (y << 1) | (z << 2)


def _compact_bits(v):
    v = v & np.uint32(0x49249249)
    v = (v | (v >> 2)) & np.uint32(0xC30C30C3)
    v = (v | (v >> 4)) & np.uint32(0x0F00F00F)
    v = (v | (v >> 8)) & np.uint32(0xFF0000FF)
    v = (v | (v >> 16)) & np.uint32(0x000003FF)
    return v


def morton3d_invert(codes):
    """(...,) uint32 Morton codes -> (..., 3) uint32 coords."""
    c = codes.astype(jnp.uint32)
    return jnp.stack(
        [_compact_bits(c), _compact_bits(c >> 1), _compact_bits(c >> 2)], axis=-1
    )


def rowmajor_to_morton(grid_size: int) -> np.ndarray:
    """(H^3,) int64: Morton code of each row-major cell index
    (x*H + y)*H + z — the permutation between this framework's row-major
    density-grid layout and the reference's Morton-indexed one
    (renderer.py update_extra_state writes at raymarching.morton3D(coords)).
    Used by the torch-ngp checkpoint import/export converters:
    ours[i] == theirs[rowmajor_to_morton(H)[i]]."""
    h = grid_size
    idx = np.arange(h**3, dtype=np.int64)
    coords = np.stack([idx // (h * h), (idx // h) % h, idx % h], axis=-1)
    return np.asarray(morton3d(jnp.asarray(coords, jnp.uint32))).astype(
        np.int64)


def packbits(occupied):
    """(..., 8*m) bool/float occupancy -> (..., m) uint8 bitfield.

    Bit k of byte j covers cell 8*j + k (LSB-first, matching the marcher's
    `byte >> (idx & 7) & 1` test).
    """
    bits = (occupied > 0).astype(jnp.uint32).reshape(*occupied.shape[:-1], -1, 8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint32)
    return jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)


def pack_blocks(occupied, grid_size: int, block: int = 4):
    """Pack a (..., H^3) row-major occupancy grid into wide block rows.

    Returns (..., (H/block)^3, block^3/32) uint32: row b holds the occupancy
    bits of one block x block x block spatial tile of cells, local bit index
    ((lx*block) + ly)*block + lz, stored LSB-first across consecutive words.

    Rationale (marcher fast path): HBM gathers cost ~5 ns per ROW regardless
    of row width on this chip, so fetching 64-512 occupancy bits per gather
    and extracting per-sample bits on the VPU cuts the march's gather count
    versus one byte-gather per sample (ops/marching.py block marcher).
    Wider blocks (8 -> 512 bits) let anchor runs span twice the distance for
    the same misprediction geometry.
    """
    words = block**3 // 32
    assert words * 32 == block**3, "block^3 must be a multiple of 32"
    h, b = grid_size, block
    nb = h // b
    assert nb * b == h, "grid_size must be divisible by block"
    occ = (occupied > 0).reshape(*occupied.shape[:-1], nb, b, nb, b, nb, b)
    # (bx, lx, by, ly, bz, lz) -> (bx, by, bz, lx, ly, lz)
    nd = occ.ndim
    lead = tuple(range(nd - 6))
    occ = jnp.transpose(
        occ, lead + tuple(nd - 6 + i for i in (0, 2, 4, 1, 3, 5))
    ).reshape(*occupied.shape[:-1], nb**3, words, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(occ.astype(jnp.uint32) << shifts, axis=-1).astype(jnp.uint32)


def block_size_of(rows) -> int:
    """Cells-per-axis of the block a pack_blocks table was packed with."""
    return round((rows.shape[-1] * 32) ** (1.0 / 3.0))


def block_bit_lookup(rows, local):
    """Extract occupancy bits from gathered block rows.

    rows: (..., W) uint32 (from pack_blocks); local: (...,) int in
    [0, 32*W). Returns bool (...,). Word selection is a binary selection
    tree over the W words (W-1 selects vs the masked-sum's 3W ops; pure
    VPU) — take_along_axis here would lower to a per-element gather."""
    local = local.astype(jnp.uint32)
    w_idx = local >> 5
    level = [rows[..., w] for w in range(rows.shape[-1])]
    bit = 0
    while len(level) > 1:
        pick_hi = (w_idx >> bit) & 1 > 0
        level = [
            jnp.where(pick_hi, level[2 * i + 1], level[2 * i])
            for i in range(len(level) // 2)
        ]
        bit += 1
    return ((level[0] >> (local & 31)) & 1).astype(bool)


def unpack_blocks(rows, grid_size: int):
    """Inverse of pack_blocks: (..., (H/b)^3, W) uint32 -> (..., H^3) bool
    row-major occupancy. Pure VPU (shifts + transpose); used by the beam
    marcher to dilate the coarse table before re-packing."""
    b = block_size_of(rows)
    h = grid_size
    nb = h // b
    assert nb * b == h and nb**3 == rows.shape[-2], (h, b, rows.shape)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (rows[..., None] >> shifts) & jnp.uint32(1)  # (..., nb^3, W, 32)
    bits = bits.reshape(*rows.shape[:-2], nb, nb, nb, b, b, b)
    nd = bits.ndim
    lead = tuple(range(nd - 6))
    # (bx, by, bz, lx, ly, lz) -> (bx, lx, by, ly, bz, lz)
    bits = jnp.transpose(
        bits, lead + tuple(nd - 6 + i for i in (0, 3, 1, 4, 2, 5))
    )
    return bits.reshape(*rows.shape[:-2], h**3).astype(bool)


def unpackbits(bitfield, n_bits=None):
    """Inverse of packbits: (..., m) uint8 -> (..., 8*m) bool."""
    b = bitfield.astype(jnp.uint32)[..., None]
    shifts = jnp.arange(8, dtype=jnp.uint32)
    bits = (b >> shifts) & 1
    out = bits.reshape(*bitfield.shape[:-1], -1).astype(bool)
    if n_bits is not None:
        out = out[..., :n_bits]
    return out
