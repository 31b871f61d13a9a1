"""Ray generation from camera poses — jittable, differentiable w.r.t. pose.

Capability parity: reference nerf/utils.py:53-116 (`get_rays`) including
error-map-driven importance sampling of pixels (utils.py:78-98). The pose
filter differentiates rays w.r.t. a candidate pose (estimator_helpers.py:
302-314), which this pure-jnp formulation supports by construction.

Camera convention (paired with provider.nerf_matrix_to_ngp): pixel directions
are (x=(i-cx)/fx, y=(j-cy)/fy, z=1) in camera frame — +x right, +y down,
+z forward — rotated by pose[:3,:3]; origins are pose[:3,3].
"""

import jax
import jax.numpy as jnp


def _pixel_dirs(i, j, intrinsics):
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    xs = (i + 0.5 - cx) / fx
    ys = (j + 0.5 - cy) / fy
    return jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)


def get_rays(pose, intrinsics, H, W, n_rays, key, error_map=None):
    """Sample n_rays random pixels of an HxW image and build world-space rays.

    pose: (4, 4) camera-to-world (ngp convention); intrinsics: (4,) fx,fy,cx,cy.
    error_map: optional (eh*ew,) importance weights (reference utils.py:78-98,
    eh=ew=128) — pixels are drawn from the coarse error bins with jitter.
    Returns dict: rays_o (n,3), rays_d (n,3), inds (n,) flat pixel indices.
    """
    if error_map is None:
        inds = jax.random.randint(key, (n_rays,), 0, H * W)
    else:
        eh = ew = 128
        k1, k2 = jax.random.split(key)
        # draw coarse bins proportionally to error, then jitter inside the bin
        coarse = jax.random.categorical(
            k1, jnp.log(error_map + 1e-8), shape=(n_rays,)
        )
        cy_, cx_ = coarse // ew, coarse % ew
        jit = jax.random.uniform(k2, (n_rays, 2))
        fy_ = jnp.clip(((cy_ + jit[:, 0]) / eh * H).astype(jnp.int32), 0, H - 1)
        fx_ = jnp.clip(((cx_ + jit[:, 1]) / ew * W).astype(jnp.int32), 0, W - 1)
        inds = fy_ * W + fx_
    j, i = inds // W, inds % W
    dirs = _pixel_dirs(i.astype(jnp.float32), j.astype(jnp.float32), intrinsics)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return {"rays_o": rays_o, "rays_d": rays_d, "inds": inds}


def get_rays_at(pose, intrinsics, W, inds):
    """Rays for given flat row-major pixel indices (n,) — the pose filter's
    per-iteration path: building all H*W rays to then gather a few hundred
    (reference estimator_helpers.py:302-314 renders full get_rays output)
    wastes H*W/n of the work; directions here are computed only at the
    sampled pixels and stay differentiable w.r.t. pose."""
    j, i = inds // W, inds % W
    dirs = _pixel_dirs(i.astype(jnp.float32), j.astype(jnp.float32), intrinsics)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return {"rays_o": rays_o, "rays_d": rays_d, "inds": inds}


def get_all_rays(pose, intrinsics, H, W, offset=None):
    """Full-image rays, row-major flat (H*W, 3) — eval/test path
    (reference get_rays with N=-1, utils.py:100-110).

    offset: optional (dx, dy) subpixel shift in pixels, applied uniformly to
    every pixel center — the GUI's anti-aliasing accumulation jitters the
    whole frame by a low-discrepancy offset per sample-per-pixel pass."""
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    i, j = i.reshape(-1), j.reshape(-1)
    if offset is not None:
        i = i + offset[0]
        j = j + offset[1]
    dirs = _pixel_dirs(i, j, intrinsics)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return {"rays_o": rays_o, "rays_d": rays_d}


def rays_from_pixels(pose, intrinsics, i, j, offset=None):
    """Rays for explicit pixel coordinates i (x), j (y) — flat (N,) float32.

    The jit-friendly core of get_all_rays: callers that render in a custom
    pixel ORDER (e.g. the trainer's tile-major chunks) precompute permuted
    (i, j) once per frame shape and trace this instead of generating
    row-major rays and permuting them through the host (two 640k-row
    device<->host round-trips per 800^2 frame). offset: optional traced
    (dx, dy) subpixel shift (GUI anti-aliasing passes — traced, so a new
    jitter does not recompile)."""
    if offset is not None:
        i = i + offset[0]
        j = j + offset[1]
    dirs = _pixel_dirs(i, j, intrinsics)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return {"rays_o": rays_o, "rays_d": rays_d}


def tile_order(H, W, tile: int = 64):
    """Permutation mapping tile-major position -> row-major flat pixel index.

    Spatially coherent ray chunks are what make the grid renderer's
    early-termination rounds fire (models/renderer.py
    render_rays_grid_rounds): a row-major 4096-ray chunk spans 5 full image
    rows and almost always contains SOME live ray, while a 64x64 tile is
    either background (skips all shading) or interior surface (terminates in
    1-2 rounds). Pure numpy — built once per frame shape on the host.

    Returns (perm (H*W,), inv (H*W,)): rays_row_major[perm] is tile-major;
    out_tile_major[inv] restores row-major.
    """
    import numpy as np

    ny = -(-H // tile)
    nx = -(-W // tile)
    perm = np.empty(H * W, np.int64)
    k = 0
    for ty in range(ny):
        for tx in range(nx):
            ys = np.arange(ty * tile, min((ty + 1) * tile, H))
            xs = np.arange(tx * tile, min((tx + 1) * tile, W))
            block = (ys[:, None] * W + xs[None, :]).reshape(-1)
            perm[k : k + block.size] = block
            k += block.size
    inv = np.empty_like(perm)
    inv[perm] = np.arange(H * W)
    return perm, inv
