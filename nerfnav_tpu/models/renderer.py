"""Differentiable volume renderer (stratified + importance sampling path).

Capability parity: reference nerf/renderer.py `run()` (125-254) — the fully
differentiable render path used by training without cuda_ray and by the whole
nav stack (pose filter gradients flow through this into a 12-dim state), plus
`sample_pdf` (12-46), `near_far_from_aabb` (raymarching.cu:93-158) and
`sph_from_ray` (raymarching.cu:164-211) as pure-XLA math.

TPU-native design: everything is static-shape, fp32 accumulation, and jittable
end-to-end — `render_rays` jits/grads/vmaps freely, and the staged
`max_ray_batch` chunking of the reference (renderer.py:555-566) becomes
host-level chunking in `render_image` (inference only; training renders one
fixed-size ray batch per step so no staging is needed inside jit).

The renderer is written against a `Field` of closures rather than a module —
the exact shape the reference injects into the nav stack (simulate.py:343-347)
and the seed of its analytic-density test pattern (quad_plot.py:442-443):
tests drive the renderer with closed-form fields, no trained model needed.

The occupancy-grid accelerated path (reference `run_cuda`) lives in
models/occupancy.py + ops/marching.py.
"""

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from nerfnav_tpu.models import network as net


class Field(NamedTuple):
    """Closure bundle the renderer (and nav stack) consume.

    density_fn: (N,3) -> (sigma (N,), geo_feat (N,G))
    color_fn:   (dirs (N,3), geo_feat (N,G)) -> rgb (N,3)
    bg_fn:      optional (sph (N,2), dirs (N,3)) -> rgb (N,3)
    """

    density_fn: Callable
    color_fn: Callable
    bound: float
    density_scale: float = 1.0
    bg_fn: Optional[Callable] = None
    bg_radius: float = -1.0
    # optional split color path: encode a ray's direction ONCE
    # (encode_dir_fn: (N,3) -> (N,E)) and shade samples from the broadcast
    # encoding (color_enc_fn: (N,E), (N,G) -> (N,3)). Renderers fall back to
    # color_fn when absent (analytic test fields).
    encode_dir_fn: Optional[Callable] = None
    color_enc_fn: Optional[Callable] = None


def make_field(params, cfg: "net.NetworkConfig") -> Field:
    """Bundle a trained network into renderer closures."""

    def density_fn(x):
        out = net.density(params, x, cfg)
        return out["sigma"], out["geo_feat"]

    def color_fn(d, geo_feat):
        return net.color(params, d, geo_feat, cfg)

    def encode_dir_fn(d):
        return net._encode_dir(d, cfg)

    def color_enc_fn(hd, geo_feat):
        return net.color_from_encoded_dir(params, hd, geo_feat, cfg)

    bg_fn = None
    if cfg.bg_radius > 0:
        def bg_fn(sph, d):  # noqa: E306
            return net.background(params, sph, d, cfg)

    return Field(
        density_fn=density_fn,
        color_fn=color_fn,
        bound=cfg.bound,
        density_scale=cfg.density_scale,
        bg_fn=bg_fn,
        bg_radius=cfg.bg_radius,
        encode_dir_fn=encode_dir_fn,
        color_enc_fn=color_enc_fn,
    )


@dataclass(frozen=True)
class RenderConfig:
    num_steps: int = 128          # uniform coarse samples per ray
    upsample_steps: int = 128     # importance samples per ray
    min_near: float = 0.2         # reference main_nerf.py:46
    max_ray_batch: int = 4096     # staged inference chunk (main_nerf.py:32)


def aabb_of(bound: float) -> jnp.ndarray:
    """Train AABB [-b,-b,-b, b,b,b] (reference renderer.py:82-85)."""
    return jnp.asarray([-bound, -bound, -bound, bound, bound, bound], jnp.float32)


def near_far_from_aabb(rays_o, rays_d, aabb, min_near: float = 0.2):
    """Slab-test ray/AABB intersection (raymarching.cu:93-158).

    rays_o, rays_d: (N, 3). Returns (near, far) each (N,), near clamped to
    min_near; rays that miss get near=far (zero-length integration segment).
    """
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)
    t0 = (aabb[:3] - rays_o) * inv_d
    t1 = (aabb[3:] - rays_o) * inv_d
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    near = jnp.maximum(tmin, min_near)
    far = jnp.maximum(tmax, near)
    return near, far


def sph_from_ray(rays_o, rays_d, radius: float):
    """Intersection of rays with the background sphere -> (N,2) coords in
    [-1,1]^2 (raymarching.cu:164-211). Rays are assumed to start inside."""
    b = jnp.sum(rays_o * rays_d, axis=-1)
    c = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    d2 = jnp.sum(rays_d * rays_d, axis=-1)
    disc = jnp.maximum(b * b - d2 * c, 0.0)
    t = (-b + jnp.sqrt(disc)) / jnp.maximum(d2, 1e-9)
    p = rays_o + t[:, None] * rays_d
    u = jnp.arctan2(p[:, 1], p[:, 0]) / jnp.pi              # azimuth in [-1,1]
    v = 2.0 * jnp.arccos(jnp.clip(p[:, 2] / radius, -1, 1)) / jnp.pi - 1.0
    return jnp.stack([u, v], axis=-1)


def sample_pdf(bins, weights, n_samples: int, key=None):
    """Inverse-CDF importance sampling (reference renderer.py:12-46).

    bins: (N, T+1) bin edges; weights: (N, T). Deterministic (midpoints) when
    key is None, stratified-uniform otherwise. Returns (N, n_samples).
    """
    n, t = weights.shape
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.concatenate([jnp.zeros((n, 1)), jnp.cumsum(pdf, axis=-1)], axis=-1)

    if key is None:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (n, n_samples))
    else:
        u = jax.random.uniform(key, (n, n_samples))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.clip(inds - 1, 0, t)
    above = jnp.clip(inds, 0, t)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    frac = (u - cdf_b) / denom
    return bins_b + frac * (bins_a - bins_b)


def composite(sigmas, rgbs, deltas, z_vals, density_scale: float = 1.0):
    """Alpha compositing along the last sample axis.

    sigmas: (N, T); rgbs: (N, T, 3); deltas, z_vals: (N, T).
    Returns (image (N,3), depth (N,), weights_sum (N,), weights (N,T)).
    Matches reference renderer.py:195-219 (alphas, shifted cumprod, sums).
    """
    alphas = 1.0 - jnp.exp(-deltas * density_scale * sigmas)  # (N, T)
    trans = jnp.cumprod(1.0 - alphas + 1e-15, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
    weights = alphas * trans
    weights_sum = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * z_vals, axis=-1)
    image = jnp.sum(weights[..., None] * rgbs, axis=-2)
    return image, depth, weights_sum, weights


def render_rays(
    field: Field,
    rcfg: RenderConfig,
    rays_o,
    rays_d,
    key=None,
    bg_color=1.0,
    crop_aabb=None,
):
    """Render a batch of rays through the field — reference `run()`.

    rays_o, rays_d: (N, 3); key: PRNGKey enables stratified perturbation
    (reference perturb flag); bg_color: scalar, (3,), or (N, 3).
    Returns {"image": (N,3), "depth": (N,), "weights_sum": (N,)}.
    Differentiable w.r.t. field params AND rays (the pose filter needs both).
    """
    n = rays_o.shape[0]
    aabb = aabb_of(field.bound)
    near, far = near_far_from_aabb(rays_o, rays_d, aabb, rcfg.min_near)
    if crop_aabb is not None:
        from nerfnav_tpu.ops.marching import crop_near_far

        near, far = crop_near_far(near, far, rays_o, rays_d, crop_aabb)
    t = rcfg.num_steps

    z_vals = near[:, None] + (far - near)[:, None] * jnp.linspace(0.0, 1.0, t)
    sample_dist = (far - near) / t  # (N,)
    if key is not None:
        key, sub = jax.random.split(key)
        z_vals = z_vals + (jax.random.uniform(sub, (n, t)) - 0.5) * sample_dist[:, None]

    def eval_density(z):
        xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        xyz = jnp.clip(xyz, aabb[:3], aabb[3:])
        sigma, geo = field.density_fn(xyz.reshape(-1, 3))
        return sigma.reshape(z.shape), geo.reshape(*z.shape, -1)

    sigmas, geo_feats = eval_density(z_vals)

    if rcfg.upsample_steps > 0:
        # importance-sample new z from the coarse weights, no grad through the
        # proposal (reference renderer.py:156-191 uses torch.no_grad()).
        deltas_c = jnp.diff(z_vals, axis=-1)
        deltas_c = jnp.concatenate([deltas_c, sample_dist[:, None]], axis=-1)
        _, _, _, w_coarse = composite(
            jax.lax.stop_gradient(sigmas),
            jnp.zeros((*sigmas.shape, 3)),
            jax.lax.stop_gradient(deltas_c),
            jax.lax.stop_gradient(z_vals),
            field.density_scale,
        )
        mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        bins = jnp.concatenate([near[:, None], mids, far[:, None]], axis=-1)
        sub = None
        if key is not None:
            key, sub = jax.random.split(key)
        new_z = jax.lax.stop_gradient(
            sample_pdf(jax.lax.stop_gradient(bins), w_coarse, rcfg.upsample_steps, sub)
        )
        new_sigmas, new_geo = eval_density(new_z)
        # merge + sort both sample sets (reference renderer.py:176-191)
        z_all = jnp.concatenate([z_vals, new_z], axis=-1)
        order = jnp.argsort(z_all, axis=-1)
        z_vals = jnp.take_along_axis(z_all, order, axis=-1)
        sigmas = jnp.take_along_axis(
            jnp.concatenate([sigmas, new_sigmas], axis=-1), order, axis=-1
        )
        geo_feats = jnp.take_along_axis(
            jnp.concatenate([geo_feats, new_geo], axis=-2), order[..., None], axis=-2
        )
        t = t + rcfg.upsample_steps

    deltas = jnp.diff(z_vals, axis=-1)
    deltas = jnp.concatenate([deltas, sample_dist[:, None]], axis=-1)

    dirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dirs = jnp.broadcast_to(dirs[:, None, :], (n, t, 3))
    rgbs = field.color_fn(
        dirs.reshape(-1, 3), geo_feats.reshape(n * t, -1)
    ).reshape(n, t, 3)

    image, depth, weights_sum, _ = composite(
        sigmas, rgbs, deltas, z_vals, field.density_scale
    )

    if field.bg_fn is not None and field.bg_radius > 0:
        sph = sph_from_ray(rays_o, rays_d, field.bg_radius)
        bg = field.bg_fn(sph, rays_d)
    else:
        bg = jnp.broadcast_to(jnp.asarray(bg_color, jnp.float32), image.shape)
    image = image + (1.0 - weights_sum)[:, None] * bg
    image = jnp.clip(image, 0.0, 1.0)
    return {"image": image, "depth": depth, "weights_sum": weights_sum}


def render_rays_grid(
    field: Field,
    occupancy,
    mcfg,
    rays_o,
    rays_d,
    key=None,
    bg_color=1.0,
    sample_budget: int | None = None,
    crop_aabb=None,
    sample_groups: int = 1,
):
    """Occupancy-grid accelerated rendering — reference `run_cuda`
    (renderer.py:257-374): march through the bitfield with empty-space
    skipping, evaluate the field only at occupied samples (static budget K),
    composite. One jittable program for both training (perturb via key) and
    inference; the reference's alive-ray compaction becomes the static-budget
    masking inside ops/marching.py (SURVEY.md 7 design translation #2).

    occupancy: occupancy-state dict (uses the coarse-fine marcher when a
    coarse bitfield is present) or a bare bitfield array.

    sample_budget (training fast path): the reference compacts train-time
    samples to a global `mean_count` point budget (renderer.py:283-288,
    raymarching.py:198-203 ray-drop when exceeded). The static-shape form:
    pack the valid samples of all rays (a prefix per ray, ray-major) into a
    (budget,) buffer, evaluate the field ONLY there, and scatter sigma/rgb
    back into the dense (N, K) layout for the unchanged composite. On a
    carved scene most (N, K) slots are dead, and every dead slot otherwise
    costs hash-encode gathers, MLP FLOPs, and — the training bottleneck —
    backward scatter rows into the hash tables. Samples past the budget are
    dropped tail-first (same semantics as the reference's ray-drop). Returns
    an extra "n_samples" scalar (total valid pre-truncation) for the
    trainer's mean-count EMA.

    sample_groups: partition rays into this many blocks that pack
    independently into budget/groups slots each (see _shade_packed) — set to
    the mesh device count under data-parallel sharding so the packing stays
    shard-local.
    """
    from nerfnav_tpu.ops.marching import march

    n = rays_o.shape[0]
    m = march(rays_o, rays_d, occupancy, mcfg, key=key, crop_aabb=crop_aabb)
    # marching runs under no-grad (reference raymarching custom_fwd
    # cast/no-grad semantics): without this, autodiff drags a backward pass
    # through the compaction scatters and candidate lattice for gradients
    # nobody consumes (the nav stack differentiates the DENSE path).
    z, dt, valid = (
        jax.lax.stop_gradient(m["z"]),
        jax.lax.stop_gradient(m["dt"]),
        m["valid"],
    )
    k = z.shape[1]
    n_samples = jnp.sum(valid)

    if sample_budget is not None and sample_budget < n * k:
        sigmas, rgbs = _shade_packed(
            field, rays_o, rays_d, z, dt, valid, sample_budget, mcfg.bound,
            groups=sample_groups,
        )
    else:
        sigmas, rgbs = _shade_dense(field, rays_o, rays_d, z, valid,
                                    mcfg.bound)

    image, depth, weights_sum, _ = composite(
        sigmas, rgbs, dt, z, field.density_scale
    )
    if field.bg_fn is not None and field.bg_radius > 0:
        sph = sph_from_ray(rays_o, rays_d, field.bg_radius)
        bg = field.bg_fn(sph, rays_d)
    else:
        bg = jnp.broadcast_to(jnp.asarray(bg_color, jnp.float32), image.shape)
    image = image + (1.0 - weights_sum)[:, None] * bg
    image = jnp.clip(image, 0.0, 1.0)
    return {"image": image, "depth": depth, "weights_sum": weights_sum,
            "n_samples": n_samples}


def _shade_dense(field, rays_o, rays_d, z, valid, bound: float):
    """Field evaluation over the full (N, K) sample lattice: density at
    o + d*z (invalid slots zeroed), color from per-ray-encoded directions
    broadcast over samples. Shared by render_rays_grid (unpacked branch)
    and render_rays_frozen."""
    n, k = z.shape
    pos = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    pos = jnp.clip(pos, -bound, bound)
    sigmas, geo = field.density_fn(pos.reshape(-1, 3))
    sigmas = jnp.where(valid.reshape(-1), sigmas, 0.0).reshape(n, k)

    dirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if field.encode_dir_fn is not None:
        hd = field.encode_dir_fn(dirs)                   # (N, E) once per ray
        hd = jnp.broadcast_to(
            hd[:, None, :], (n, k, hd.shape[-1])
        ).reshape(-1, hd.shape[-1])
        rgbs = field.color_enc_fn(hd, geo).reshape(n, k, 3)
    else:
        dirs_b = jnp.broadcast_to(dirs[:, None, :], (n, k, 3)).reshape(-1, 3)
        rgbs = field.color_fn(dirs_b, geo).reshape(n, k, 3)
    return sigmas, rgbs


def _pack_indices(valid, budget: int):
    """Packed-slot -> (ray, in-ray position) mapping for a per-ray PREFIX
    mask. Returns (r (budget,) int32, j (budget,) int32, pvalid (budget,)).

    Ray id per packed slot WITHOUT searchsorted (binary search lowers to
    log(N) serialized gather rounds on TPU): scatter each ray's id at its
    segment start, then a running max fills the segment. Rays sharing a
    start (count == 0) resolve to the later ray via the max — correct,
    an empty ray owns no slots. Same trick propagates the segment start
    offset (monotone in position, so max == last-written)."""
    n, k = valid.shape
    counts = jnp.sum(valid, axis=1)                      # (N,)
    offsets = jnp.cumsum(counts) - counts                # exclusive prefix
    total = offsets[-1] + counts[-1]
    p = jnp.arange(budget)
    ray_ids = jnp.arange(n, dtype=jnp.int32)
    seg_ray = jnp.zeros((budget,), jnp.int32).at[offsets].max(
        ray_ids, mode="drop")
    seg_off = jnp.zeros((budget,), jnp.int32).at[offsets].max(
        offsets.astype(jnp.int32), mode="drop")
    r = jax.lax.associative_scan(jnp.maximum, seg_ray)
    off_r = jax.lax.associative_scan(jnp.maximum, seg_off)
    j = p - off_r
    return r, j, p < total


def _shade_packed(field, rays_o, rays_d, z, dt, valid, budget: int,
                  bound: float, groups: int = 1):
    """Field evaluation over a packed global sample buffer (see
    render_rays_grid's sample_budget). valid is a per-ray PREFIX mask, so
    packing is three cheap gathers: packed slot p belongs to ray
    r(p) = searchsorted(offsets, p) with in-ray position j(p) = p -
    offsets[r] (computed scan-style, _pack_indices). Scatter-back into the
    dense (N, K) layout keeps the composite (and its gradient) identical to
    the unpacked path; the scatter's backward is a gather.

    groups > 1 partitions the rays into `groups` equal blocks, each packing
    into budget/groups slots INDEPENDENTLY (per-block cumsums, gathers, and
    scatters). Under a device mesh with rays sharded over the data axis,
    groups = n_devices aligns the blocks with the shards, so the packing
    never synchronizes across devices (the global-cumsum form would) — the
    reference's global mean_count ray-drop becomes a per-shard ray-drop,
    the same approximation one step finer.

    PREFIX INVARIANT: every marcher configuration yields prefix masks —
      * _compact_idx / _compact_first_k: valid = (rank <= count), a prefix
        by construction;
      * first_k hybrid (_compact_idx_hybrid): concat(front, tail) where the
        front is FULL whenever the tail is nonempty (tail candidates exist
        only past k_front occupied ones), so the concatenation is a prefix;
      * proxy_terminate (segment- or sample-level): masks by
        (T_prev > thresh); transmittance is monotone non-increasing along
        the sample axis, so the mask is itself a prefix, and a prefix AND a
        prefix is a prefix.
    tests/test_renderer.py::TestPackedPrefix pins packed == dense under
    first_k and proxy_terminate. Defense in depth for a future non-prefix
    mask: packed sigmas are zeroed where the mapped dense slot is invalid,
    so a violated invariant degrades to dropped samples (same class as the
    budget's tail-drop), never to shading garbage positions."""
    n, k = z.shape
    g = groups if groups > 1 else 1
    assert n % g == 0 and budget % g == 0, (n, budget, g)
    ng, bg = n // g, budget // g

    valid_g = valid.reshape(g, ng, k)
    r_l, j, pvalid = jax.vmap(lambda v: _pack_indices(v, bg))(valid_g)
    flat_l = jnp.clip(r_l * k + j, 0, ng * k - 1)        # (g, bg) local

    # valid bit of the mapped dense slot rides the z/dt gather (defense in
    # depth: under the prefix invariant it equals pvalid)
    zdt = jnp.stack(
        [z.reshape(g, -1), dt.reshape(g, -1),
         valid.reshape(g, -1).astype(z.dtype)], axis=-1)  # (g, ng*k, 3)
    zdt = jnp.take_along_axis(zdt, flat_l[..., None], axis=1)  # (g, bg, 3)
    zp = zdt[..., 0].reshape(-1)
    pvalid_slot = zdt[..., 2].reshape(-1) > 0
    pvalid = pvalid.reshape(-1)
    dirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if field.encode_dir_fn is not None:
        # per-RAY dir encoding rides the existing per-slot ray gather
        hd = field.encode_dir_fn(dirs)                   # (N, E)
        rb = jnp.concatenate([rays_o, rays_d, hd], axis=-1)
    else:
        rb = jnp.concatenate([rays_o, rays_d, dirs], axis=-1)
    rb = jnp.take_along_axis(
        rb.reshape(g, ng, -1), r_l[..., None], axis=1
    ).reshape(g * bg, -1)                                # (budget, C)
    rop, rdp = rb[:, :3], rb[:, 3:6]
    pos = jnp.clip(rop + rdp * zp[:, None], -bound, bound)
    sig_p, geo_p = field.density_fn(pos)
    sig_p = jnp.where(pvalid & pvalid_slot, sig_p, 0.0)
    if field.encode_dir_fn is not None:
        rgb_p = field.color_enc_fn(rb[:, 6:], geo_p)     # (budget, 3)
    else:
        rgb_p = field.color_fn(rb[:, 6:], geo_p)

    vals = jnp.concatenate([sig_p[:, None], rgb_p], axis=-1).reshape(g, bg, 4)
    tgt = jnp.where(pvalid.reshape(g, bg), flat_l, ng * k)  # OOB rows drop
    buf = jax.vmap(
        lambda t, v: jnp.zeros((ng * k, 4)).at[t].set(v, mode="drop")
    )(tgt, vals)
    return buf[..., 0].reshape(n, k), buf[..., 1:].reshape(n, k, 3)


def render_rays_frozen(field, bound, rays_o, rays_d, z, dt, valid,
                       bg_color=1.0):
    """Shade + composite at PRECOMPUTED sample depths — the march-free half
    of render_rays_grid.

    The pose filter's frozen-march mode marches ONCE per update at the
    predicted pose and then optimizes the 12-dim state against these fixed
    (z, dt, valid) buffers: positions o(pose) + d(pose) * z stay
    differentiable (forward and reverse) w.r.t. the pose through the rays
    while the sample lattice is constant. Within one filter update the pose
    moves millimeters, so spans marched at the prediction stay on the
    surface — unlike re-marching per iteration (the measured-slower
    `--filter_render grid` mode), this costs K shaded samples per ray per
    iteration and zero march work. Analogue of the reference's fixed
    512-sample dense path (simulate.py:163-166) with occupancy-pruned
    samples.

    z, dt, valid: (N, K) from ops.marching.march. Returns the
    render_rays_grid output dict (minus n_samples).
    """
    z = jax.lax.stop_gradient(z)
    dt = jax.lax.stop_gradient(dt)
    sigmas, rgbs = _shade_dense(field, rays_o, rays_d, z, valid, bound)

    image, depth, weights_sum, _ = composite(
        sigmas, rgbs, dt, z, field.density_scale
    )
    if field.bg_fn is not None and field.bg_radius > 0:
        sph = sph_from_ray(rays_o, rays_d, field.bg_radius)
        bg = field.bg_fn(sph, rays_d)
    else:
        bg = jnp.broadcast_to(jnp.asarray(bg_color, jnp.float32), image.shape)
    image = image + (1.0 - weights_sum)[:, None] * bg
    image = jnp.clip(image, 0.0, 1.0)
    return {"image": image, "depth": depth, "weights_sum": weights_sum}


def render_rays_grid_rounds(
    field: Field,
    occupancy,
    mcfg,
    rays_o,
    rays_d,
    key=None,
    bg_color=1.0,
    round_samples: int = 8,
    crop_aabb=None,
    round_compact: int = 4,
    shade_order: str = "ray",
    z_window=None,
    phase_a=None,
):
    """Grid-path rendering with on-device early termination.

    The reference's inference loop (renderer.py:325-374) marches alive rays
    in small step batches and RETIRES a ray when its transmittance drops
    under 1e-4 (raymarching.cu composite_rays, 829-922), so occluded samples
    never reach the MLP. Its mechanism — in-place compaction of a dynamic
    alive-ray list — is untranslatable to XLA's static shapes; the TPU form:
    march the full static budget K once, then shade it in K/round_samples
    rounds of `round_samples` samples, each round wrapped in a `lax.cond`
    that skips the field eval when EVERY ray in the chunk is already
    terminated (T < 1e-4) or has no valid samples left. Callers chunk a
    frame into spatially coherent tiles (data/rays.py tile order) so the
    all-dead predicate fires early: background tiles stop after the march,
    surface tiles stop after 1-2 rounds, and only silhouette tiles shade the
    whole budget. Chip-profiled: the field eval (hash gathers + MLP) is half
    the render, and a converged opaque scene terminates most rays within
    ~8 samples.

    Results are identical to render_rays_grid up to the T<1e-4 tail (the
    same tolerance the reference accepts). Inference-only by design: the
    training path keeps the single-shot shade (gradients want no conds).

    round_compact: when > 1 and at most n/round_compact rays are still alive
    at a round, the round gathers the alive rays to a static n/round_compact
    prefix, shades only that, and scatters the contributions back — the
    static-shape analogue of the reference's alive-ray list compaction
    (renderer.py:325-374). After the first round kills the surface rays,
    later rounds shade a quarter of the lanes instead of mostly-dead full
    width. Dropped (dead) rays lose only their T<1e-4 tail, the same
    tolerance as the all-dead skip. 0 or 1 disables.
    """
    from nerfnav_tpu.ops.marching import march

    n = rays_o.shape[0]
    m = march(rays_o, rays_d, occupancy, mcfg, key=key, crop_aabb=crop_aabb,
              z_window=z_window, phase_a=phase_a)
    z, dt, valid = (
        jax.lax.stop_gradient(m["z"]),
        jax.lax.stop_gradient(m["dt"]),
        m["valid"],
    )
    k = z.shape[1]
    r = min(round_samples, k)

    dirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    # encode each ray's direction ONCE; rounds broadcast the encoding over
    # their sample axis (SH recurrences per ray, not per sample point)
    hd_ray = field.encode_dir_fn(dirs) if field.encode_dir_fn else None

    def shade_core(o_c, d_c, hd_c, trans_c, zc, dtc, vc):
        """Shade one round at the (static) width of its inputs; returns the
        per-ray contribution deltas and the updated transmittance."""
        w = o_c.shape[0]
        rc = zc.shape[1]
        pos = o_c[:, None, :] + d_c[:, None, :] * zc[..., None]
        pos = jnp.clip(pos, -mcfg.bound, mcfg.bound)
        if shade_order == "depth":
            # depth-major gather order: consecutive hash-table gathers are
            # ADJACENT RAYS at the same depth (spatially coherent across the
            # tile) instead of consecutive samples along one ray — feeds the
            # gather unit runs of near-identical rows (chip microbench: ~2 ns
            # cached vs ~25 ns random per row)
            pos_t = pos.transpose(1, 0, 2)  # (rc, w, 3)
            sigmas, geo = field.density_fn(pos_t.reshape(-1, 3))
            sigmas = jnp.where(
                vc.T.reshape(-1), sigmas, 0.0).reshape(rc, w).T
            if hd_ray is not None:
                hd_b = jnp.broadcast_to(
                    hd_c[None, :, :], (rc, w, hd_c.shape[-1])
                ).reshape(-1, hd_c.shape[-1])
                rgbs = field.color_enc_fn(hd_b, geo).reshape(rc, w, 3)
            else:
                d_b = jnp.broadcast_to(
                    hd_c[None, :, :], (rc, w, 3)).reshape(-1, 3)
                rgbs = field.color_fn(d_b, geo).reshape(rc, w, 3)
            rgbs = rgbs.transpose(1, 0, 2)
        else:
            sigmas, geo = field.density_fn(pos.reshape(-1, 3))
            sigmas = jnp.where(vc.reshape(-1), sigmas, 0.0).reshape(zc.shape)
            if hd_ray is not None:
                hd_b = jnp.broadcast_to(
                    hd_c[:, None, :], (w, rc, hd_c.shape[-1])
                ).reshape(-1, hd_c.shape[-1])
                rgbs = field.color_enc_fn(hd_b, geo).reshape(w, rc, 3)
            else:
                d_b = jnp.broadcast_to(
                    hd_c[:, None, :], (w, rc, 3)).reshape(-1, 3)
                rgbs = field.color_fn(d_b, geo).reshape(w, rc, 3)

        alphas = 1.0 - jnp.exp(-dtc * field.density_scale * sigmas)
        # continue the ray's transmittance from the previous rounds
        t_within = jnp.cumprod(1.0 - alphas + 1e-15, axis=-1)
        t_within = jnp.concatenate(
            [jnp.ones_like(t_within[:, :1]), t_within[:, :-1]], axis=-1
        )
        weights = alphas * trans_c[:, None] * t_within
        img_d = jnp.sum(weights[..., None] * rgbs, axis=-2)
        dep_d = jnp.sum(weights * zc, axis=-1)
        ws_d = jnp.sum(weights, axis=-1)
        trans_new = trans_c * t_within[:, -1] * (1.0 - alphas[:, -1] + 1e-15)
        return img_d, dep_d, ws_d, trans_new

    hd_or_dirs = hd_ray if hd_ray is not None else dirs

    def full_round(carry, zc, dtc, vc):
        image, depth, wsum, trans = carry
        img_d, dep_d, ws_d, trans_new = shade_core(
            rays_o, rays_d, hd_or_dirs, trans, zc, dtc, vc)
        return image + img_d, depth + dep_d, wsum + ws_d, trans_new

    n_comp = n // round_compact if round_compact and round_compact > 1 else 0

    def narrow_round(carry, zc, dtc, vc, alive):
        image, depth, wsum, trans = carry
        idx = jnp.nonzero(alive, size=n_comp, fill_value=n)[0]
        safe = jnp.minimum(idx, n - 1)
        pad = idx >= n
        vc_c = jnp.take(vc, safe, axis=0) & (~pad)[:, None]
        img_d, dep_d, ws_d, trans_new = shade_core(
            jnp.take(rays_o, safe, axis=0), jnp.take(rays_d, safe, axis=0),
            jnp.take(hd_or_dirs, safe, axis=0), jnp.take(trans, safe),
            jnp.take(zc, safe, axis=0), jnp.take(dtc, safe, axis=0), vc_c)
        image = image.at[idx].add(img_d, mode="drop")
        depth = depth.at[idx].add(dep_d, mode="drop")
        wsum = wsum.at[idx].add(ws_d, mode="drop")
        trans = trans.at[idx].set(trans_new, mode="drop")
        return image, depth, wsum, trans

    carry = (
        jnp.zeros((n, 3)),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
        jnp.ones((n,)),
    )
    for s in range(0, k, r):
        zc, dtc, vc = z[:, s : s + r], dt[:, s : s + r], valid[:, s : s + r]
        alive = (carry[3] > 1e-4) & jnp.any(vc, axis=-1)
        na = jnp.sum(alive)
        if n_comp:
            carry = jax.lax.cond(
                na > 0,
                lambda c, zc=zc, dtc=dtc, vc=vc, alive=alive, na=na:
                    jax.lax.cond(
                        na <= n_comp,
                        lambda c2: narrow_round(c2, zc, dtc, vc, alive),
                        lambda c2: full_round(c2, zc, dtc, vc),
                        c,
                    ),
                lambda c: c,
                carry,
            )
        else:
            carry = jax.lax.cond(
                na > 0,
                lambda c, zc=zc, dtc=dtc, vc=vc: full_round(c, zc, dtc, vc),
                lambda c: c,
                carry,
            )
    image, depth, wsum, _ = carry

    if field.bg_fn is not None and field.bg_radius > 0:
        sph = sph_from_ray(rays_o, rays_d, field.bg_radius)
        bg = field.bg_fn(sph, rays_d)
    else:
        bg = jnp.broadcast_to(jnp.asarray(bg_color, jnp.float32), image.shape)
    image = image + (1.0 - wsum)[:, None] * bg
    image = jnp.clip(image, 0.0, 1.0)
    return {"image": image, "depth": depth, "weights_sum": wsum}


def render_image(field: Field, rcfg: RenderConfig, rays_o, rays_d, bg_color=1.0,
                 chunk=None):
    """Staged full-image rendering (reference renderer.py:555-566): host-level
    loop over fixed-size ray chunks so each jit sees one static shape."""
    chunk = chunk or rcfg.max_ray_batch
    n = rays_o.shape[0]
    pad = (-n) % chunk
    ro = jnp.concatenate([rays_o, jnp.zeros((pad, 3))]) if pad else rays_o
    rd = (
        jnp.concatenate([rays_d, jnp.ones((pad, 3)) / jnp.sqrt(3.0)])
        if pad
        else rays_d
    )
    outs = []
    for i in range(0, n + pad, chunk):
        outs.append(
            render_rays(field, rcfg, ro[i : i + chunk], rd[i : i + chunk],
                        bg_color=bg_color)
        )
    return {k: jnp.concatenate([o[k] for o in outs])[:n] for k in outs[0]}
