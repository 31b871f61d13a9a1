"""Stage breakdown of the grid-path render on the real chip.

Times each pipeline stage as its own jitted program over the same ray chunks
as bench.py: block march (phase A only / full), field encode+MLP on the
marched samples, compositing, and the full fused render. Stage sums exceed
the fused time (XLA overlaps stages inside one program); the point is the
RATIO — which stage to attack next.

Run: python benchmarks/profile_render.py [--chunk 4096] [--iters 5]
"""

import argparse
import time

import numpy as np

from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp

    from nerfnav_tpu.data.rays import get_all_rays
    from nerfnav_tpu.models import (
        NetworkConfig, init_network, make_field, render_rays_grid,
    )
    from nerfnav_tpu.models import network as net
    from nerfnav_tpu.ops import marching as M
    from nerfnav_tpu.ops.morton import pack_blocks, packbits

    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--coarse_segments", type=int, default=12)
    ap.add_argument("--coarse_anchors", type=int, default=2)
    ap.add_argument("--table_dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--scan", default=True,
                    action=argparse.BooleanOptionalAction,
                    help="stage timing under the whole-frame lax.map "
                         "dispatch (bench.py default); --no-scan for the "
                         "per-chunk pipelined loop")
    ap.add_argument("--first_k", action="store_true")
    ap.add_argument("--t_a0", type=int, default=0,
                    help="static phase-A ladder override (bench --occ_crop "
                         "uses plan_occupied_crop; this isolates the ladder-"
                         "length effect without the crop)")
    ap.add_argument("--occ_crop", action="store_true")
    ap.add_argument("--g_a", type=int, default=0,
                    help="phase-A anchor-run length override (phase_a_group)")
    ap.add_argument("--beam", type=int, default=1,
                    help="beam-shared phase A width (bench default 8 since "
                         "round 4; the round-4 profile ran beam 1 and "
                         "overstated phase A's share of the beamed config)")
    ap.add_argument("--dt_gamma", type=float, default=0.0,
                    help="gamma attribution (VERDICT r4 item 6: gamma "
                         "1/128 runs 2.23x SLOWER than 0 with the ladder "
                         "length exonerated — the stage split under gamma "
                         "is the missing evidence)")
    ap.add_argument("--stages", default=None,
                    help="comma list of stage names to run (default all)")
    args = ap.parse_args()

    BOUND = 2.0
    H = W = args.res
    cfg = NetworkConfig(bound=BOUND, mlp_dtype="bfloat16", grid_layout="cell",
                        grid_log2_hashmap_size=17, grid_levels=4,
                        grid_level_dim=8)
    mcfg = M.MarchConfig(bound=BOUND, grid_size=128, max_steps=1024,
                         samples_per_ray=args.k, min_near=0.2,
                         coarse_segments=args.coarse_segments,
                         coarse_anchors=args.coarse_anchors,
                         first_k=args.first_k,
                         phase_a_group=args.g_a,
                         beam=args.beam,
                         dt_gamma=args.dt_gamma)
    params = init_network(jax.random.PRNGKey(0), cfg)
    if args.table_dtype == "bfloat16":
        params["encoder"] = [t.astype(jnp.bfloat16) for t in params["encoder"]]
    field = make_field(params, cfg)

    Hg = mcfg.grid_size
    idx = np.arange(Hg**3)
    c = (np.stack([idx // (Hg * Hg), (idx // Hg) % Hg, idx % Hg], -1) + 0.5) / Hg * 2 - 1
    r = np.linalg.norm(c, axis=-1)
    occ0 = ((r > 0.35) & (r < 0.5)) | (np.abs(c[:, 2] + 0.8) < 0.05)
    occs = [occ0] + [(r < 0.3) for _ in range(1, mcfg.cascades)]
    bitfield = jnp.stack([packbits(jnp.asarray(o.astype(np.float32))) for o in occs])
    f = mcfg.coarse_factor
    hc = Hg // f
    coarse = jnp.stack([
        packbits(jnp.asarray(
            o.reshape(hc, f, hc, f, hc, f).max(axis=(1, 3, 5)).reshape(-1)
            .astype(np.float32)))
        for o in occs
    ])
    occ_all = jnp.asarray(np.stack(occs))
    occ_coarse = jnp.asarray(np.stack([
        o.reshape(hc, f, hc, f, hc, f).max(axis=(1, 3, 5)).reshape(-1)
        for o in occs
    ]))
    occupancy = {
        "bitfield": bitfield,
        "bitfield_coarse": coarse,
        "blocks": pack_blocks(occ_all, Hg),
        "blocks_coarse": pack_blocks(occ_coarse, hc, block=8),
    }
    if args.beam > 1:
        # precomputed dilated coarse table (bench parity; the in-march
        # rebuild was the round-5 beamed-phase-A attribution finding)
        occupancy["blocks_coarse_dilated"] = M.dilate_blocks_coarse(
            occupancy["blocks_coarse"], hc, 8)

    crop_aabb = None
    if args.occ_crop or args.t_a0:
        import dataclasses

        if args.occ_crop:
            aabb, t_a0 = M.plan_occupied_crop(np.stack(occs), mcfg)
            crop_aabb = jnp.asarray(aabb)
            if args.t_a0:  # explicit ladder override on top of the crop
                t_a0 = args.t_a0
        else:
            t_a0 = args.t_a0
        mcfg = dataclasses.replace(mcfg, t_a0_steps=t_a0)
        print(f"t_a0_steps={t_a0} crop={crop_aabb is not None}")

    intr = jnp.asarray([1000.0, 1000.0, W / 2, H / 2], jnp.float32)
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.0, 0.0, -1.8]))
    rays = get_all_rays(pose, intr, H, W)
    CHUNK = args.chunk
    n = H * W
    pad = (-n) % CHUNK
    from nerfnav_tpu.data.rays import tile_order

    perm, _inv = tile_order(H, W, 64)
    ro = jnp.asarray(np.concatenate([np.asarray(rays["rays_o"])[perm],
                                     np.zeros((pad, 3), np.float32)]))
    rd = jnp.asarray(np.concatenate([np.asarray(rays["rays_d"])[perm],
                                     np.ones((pad, 3), np.float32)]))
    chunks = [(ro[i:i + CHUNK], rd[i:i + CHUNK]) for i in range(0, n + pad, CHUNK)]

    # ---- stage programs
    @jax.jit
    def full(a, b):
        return render_rays_grid(field, occupancy, mcfg, a, b, bg_color=1.0, crop_aabb=crop_aabb)["image"]

    @jax.jit
    def march_only(a, b):
        m = M.march(a, b, occupancy, mcfg, crop_aabb=crop_aabb)
        return m["z"] + m["dt"] + m["valid"]

    @jax.jit
    def march_phase_a(a, b):
        # mirrors march_rays_block's phase A (ladder + grouped block test +
        # segment compaction), nothing after it
        from nerfnav_tpu.ops.morton import block_size_of

        blocks_coarse = occupancy["blocks_coarse"]
        hc = mcfg.grid_size // mcfg.coarse_factor
        bc = block_size_of(blocks_coarse)
        c0 = min(1.0, mcfg.bound)
        base = mcfg.dt_min * mcfg.coarse_step_mult
        dt_a_max = M._phase_a_cap(mcfg) if mcfg.coarse_normalized else base
        sb_world = bc * 2.0 * c0 / hc
        slack = 1.5 if mcfg.coarse_normalized else 1.0
        g_a = max(1, min(int(slack * sb_world / dt_a_max), 32))
        near, far = M.near_far_aabb(a, b, mcfg.bound, mcfg.min_near, crop_aabb)
        z_a, dt_a, t_a = M._phase_a_ladder(near, far, mcfg, round_to=g_a)
        pos_a = a[:, None, :] + b[:, None, :] * z_a[..., None]
        flat_a, local_a = M._block_coords(pos_a, dt_a, hc, mcfg, block=bc)
        anchors_a = [0, g_a - 1] if (mcfg.coarse_anchors == 2 and g_a > 1) else None
        occ_a = M._grouped_block_test(
            blocks_coarse.reshape(-1, blocks_coarse.shape[-1]), flat_a,
            local_a, g_a, anchors=anchors_a)
        idx_a, valid_a, stride_a = M._compact_idx(occ_a, mcfg.coarse_segments)
        return idx_a.sum() + valid_a.sum() + stride_a.sum()

    @jax.jit
    def march_a_stop(a, b):
        # EXACT phase A of the shipped marcher (incl. beam sharing, gamma
        # ladder, compaction + broadcast) via the stop_after hook — the
        # hand-mirrored march_phase_a above predates beam/gamma and runs
        # the unbeamed ladder only
        m = M.march(a, b, occupancy, mcfg, crop_aabb=crop_aabb,
                    stop_after="phase_a")
        return m["z"].sum() + m["dt"].sum() + m["valid"].sum()

    @jax.jit
    def march_b_occ_stop(a, b):
        # phase A + the phase-B fine occupancy test, WITHOUT the final
        # sample compaction/reconstruction: full-march minus this is the
        # compaction cost
        m = M.march(a, b, occupancy, mcfg, crop_aabb=crop_aabb,
                    stop_after="phase_b_occ")
        return m["z"].sum() + m["valid"].sum()

    @jax.jit
    def field_on_marched(a, b):
        m = M.march(a, b, occupancy, mcfg, crop_aabb=crop_aabb)
        z, valid = m["z"], m["valid"]
        pos = a[:, None, :] + b[:, None, :] * z[..., None]
        sig, geo = field.density_fn(pos.reshape(-1, 3))
        dirs = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        k = z.shape[1]
        dirs = jnp.broadcast_to(dirs[:, None, :], (a.shape[0], k, 3)).reshape(-1, 3)
        rgb = field.color_fn(dirs, geo)
        return sig.sum() + rgb.sum()

    @jax.jit
    def density_on_marched(a, b):
        m = M.march(a, b, occupancy, mcfg, crop_aabb=crop_aabb)
        pos = a[:, None, :] + b[:, None, :] * m["z"][..., None]
        sig, _ = field.density_fn(pos.reshape(-1, 3))
        return sig.sum()

    @jax.jit
    def density_on_fixed(a, b):
        # same point count, no march: lattice along each ray
        k = mcfg.samples_per_ray
        z = jnp.linspace(0.5, 3.0, k)[None, :]
        pos = a[:, None, :] + b[:, None, :] * z[..., None]
        sig, _ = field.density_fn(pos.reshape(-1, 3))
        return sig.sum()

    ro_s = ro.reshape(-1, CHUNK, 3)
    rd_s = rd.reshape(-1, CHUNK, 3)

    def bench(fn, name):
        if args.scan:
            scanned = jax.jit(lambda a_s, b_s: jax.lax.map(
                lambda ab: fn(ab[0], ab[1]), (a_s, b_s)))
            scanned(ro_s, rd_s).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.iters):
                scanned(ro_s, rd_s).block_until_ready()
        else:
            fn(*chunks[0]).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.iters):
                outs = [fn(a, b) for a, b in chunks]
                jax.block_until_ready(outs[-1])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:24s} {dt * 1e3:8.1f} ms/frame  "
              f"{n / dt / 1e3:8.0f} krays/s")
        return dt

    from nerfnav_tpu.models import render_rays_grid_rounds

    import dataclasses

    cfg_s = dataclasses.replace(cfg, density_scale=300.0)
    field_s = make_field(params, cfg_s)

    @jax.jit
    def rounds_full(a, b):
        return render_rays_grid_rounds(field_s, occupancy, mcfg, a, b,
                                       bg_color=1.0, round_samples=8,
                                       round_compact=4,
                                       crop_aabb=crop_aabb)["image"]

    stages = [
        (rounds_full, "rounds render (flagship)"),
        (full, "full render"),
        (march_only, "march only"),
        (march_phase_a, "march phase A only"),
        (march_a_stop, "march A stop (exact)"),
        (march_b_occ_stop, "march A+B occ (exact)"),
        (field_on_marched, "march+encode+mlp"),
        (density_on_marched, "march+density"),
        (density_on_fixed, "density (no march)"),
    ]
    want = set(args.stages.split(",")) if args.stages else None
    for fn, name in stages:
        if want is None or any(w in name for w in want):
            bench(fn, name)


if __name__ == "__main__":
    main()
