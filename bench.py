"""Benchmark: occupancy-grid NeRF rendering throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's headline inference path (BASELINE.md: rays/sec/chip
on a Stonehenge-class scene) — flagship Instant-NGP field (cell-layout hash
grid, 4 levels x 8 features @ 2^17, 2x64 sigma MLP, SH-16 + 3x64 color MLP,
converged-scene opacity), bound=2 (2 cascades), 800x800 rays in 64x64 tiles
marched through a ~converged occupancy bitfield with the static K-budget
block marcher (normalized phase-A ladders) and composited.

vs_baseline: ratio against 1e7 rays/s — the order of magnitude a torch-ngp
class renderer sustains on a single consumer GPU for converged scenes (no
number is published in-repo; BASELINE.md records the north star as >=10x
that, i.e. vs_baseline >= 10 is the target).
"""

import argparse
import json
import time

import numpy as np


from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--path", default="rounds", choices=["single", "rounds"],
                   help="shading: early-terminating rounds (default; chip "
                        "A/B +21%% over single-shot) or single-shot")
    p.add_argument("--fixed_march", action="store_true",
                   help="A/B control: fixed phase-A ladder")
    p.add_argument("--row_major", action="store_true",
                   help="A/B control: row-strip chunks instead of 64x64 tiles")
    p.add_argument("--k", type=int, default=32, help="per-ray sample budget")
    p.add_argument("--proxy", action="store_true",
                   help="proxy occlusion termination in the march")
    p.add_argument("--density_scale", type=float, default=300.0)
    p.add_argument("--levels", type=int, default=4)
    p.add_argument("--level_dim", type=int, default=8)
    p.add_argument("--log2", type=int, default=17)
    p.add_argument("--round_samples", type=int, default=8,
                   help="samples shaded per early-termination round")
    p.add_argument("--round_compact", type=int, default=4,
                   help="alive-ray compaction divisor for later rounds "
                        "(0/1 = off)")
    p.add_argument("--chunk", type=int, default=4096,
                   help="rays per dispatch chunk (default 4096: chip chunk "
                        "re-sweep under --scan; 8192 was best for the "
                        "pipelined per-chunk dispatch)")
    p.add_argument("--tile", type=int, default=64)
    p.add_argument("--dt_gamma", type=float, default=0.0,
                   help="adaptive stepping (block marcher static gamma "
                        "ladder; 1/128 = colmap default). occ_ladder is "
                        "skipped for gamma (the gamma ladder has its own "
                        "static length)")
    p.add_argument("--coarse_factor", type=int, default=4)
    p.add_argument("--coarse_step_mult", type=int, default=8)
    p.add_argument("--coarse_segments", type=int, default=12)
    p.add_argument("--coarse_anchors", type=int, default=2)
    p.add_argument("--first_k", action="store_true",
                   help="first-K compaction (reference inference semantics; "
                        "pair with --proxy so occlusion gates the budget)")
    p.add_argument("--coarse_first_k", action="store_true",
                   help="phase-A first-K hybrid compaction (front segments "
                        "at full resolution)")
    p.add_argument("--table_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="hash-table storage dtype (default bfloat16: +17%% "
                        "chip A/B over fp32 at zero quality cost — "
                        "26.7038 -> 26.7035 dB on the 30k checkpoint; "
                        "RESULTS.md round-2 queue table)")
    p.add_argument("--g_a", type=int, default=0,
                   help="phase-A anchor-run length override "
                        "(MarchConfig.phase_a_group; 0 = auto)")
    p.add_argument("--t_a0", type=int, default=0,
                   help="static phase-A ladder length override "
                        "(MarchConfig.t_a0_steps; 0 = auto)")
    p.add_argument("--occ_ladder", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="occupancy-derived static ladder shrink "
                        "(plan_occupied_ladder): bounds the phase-A ladder "
                        "by the cube-entry -> occupied-AABB-exit span, no "
                        "ray crop — the fast half of --occ_crop. Default ON "
                        "(+33%% chip A/B, 3.21M vs 2.42M rays/s: the plan "
                        "lands the ladder on the 8-anchor-run compile-shape "
                        "optimum, RESULTS.md round-2 ladder-cliff table); "
                        "--no-occ_ladder for the full-cube control")
    p.add_argument("--autotune", action="store_true",
                   help="measure-and-pick the phase-A compile shape "
                        "(g_a, t_a0) on the live chip before timing "
                        "(ops/marching.autotune_march_shape; the ladder-"
                        "shape cliff is scene/bound-dependent). Overrides "
                        "--occ_ladder/--g_a/--t_a0")
    p.add_argument("--occ_crop", action="store_true",
                   help="occupied-AABB march planning: crop rays to the "
                        "occupied-cell AABB and shrink the static phase-A "
                        "ladder to its diagonal (plan_occupied_crop) — "
                        "exact, zero per-frame cost")
    p.add_argument("--shade_order", default="ray", choices=["ray", "depth"],
                   help="hash-gather issue order in the rounds shading: "
                        "ray-major (default) or depth-major (cross-ray "
                        "spatial coherence)")
    p.add_argument("--a0", type=int, default=0,
                   help="phase-A0 super-coarse prefilter: keep this many "
                        "block spans (0 = off)")
    p.add_argument("--beam", type=int, default=8,
                   help="phase-A beam sharing: consecutive rays per shared "
                        "coarse march (MarchConfig.beam; row-major 64x64 "
                        "tiles keep members pixel-adjacent). Default 8 — "
                        "round 5 (precomputed dilation): 3.94M vs 3.29M "
                        "beam-1 (+20%%), the widest RELIABLE width. beam "
                        "16 renders correctly (march sweep keeps 100.4%% "
                        "of beam-1 samples; mean_image identical) and "
                        "usually measures ~4.1M, but 1 run in 3 lands a "
                        "10x-slower compile/runtime schedule (RESULTS.md "
                        "round-5 arm table) — not a recordable default")
    p.add_argument("--scan", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="whole-frame single dispatch: lax.map over stacked "
                        "chunks inside ONE jitted program (kills the "
                        "~0.4 ms/chunk relay dispatch floor). "
                        "Default ON: +38%% chip A/B over the pipelined "
                        "per-chunk dispatch at chunk 4096 (RESULTS.md "
                        "round-2 queue-10 table); --no-scan for the A/B "
                        "control")
    p.add_argument("--hw", type=int, default=800,
                   help="image side (CPU smoke runs use a small value)")
    p.add_argument("--yaw", type=float, default=0.0,
                   help="camera yaw (degrees) around the scene Y axis — "
                        "off-axis A/B framing, not the headline metric")
    p.add_argument("--depth_out", action="store_true",
                   help="A/B: also return depth from the scan program "
                        "(the Trainer product path does; bench's image-only "
                        "return lets XLA DCE the depth accumulation)")
    p.add_argument("--nested_jit", action="store_true",
                   help="A/B: wrap the per-chunk render in its own jit "
                        "inside the scan program (the Trainer's scan maps "
                        "over an already-jitted chunk fn)")
    p.add_argument("--frame_phase_a", default=False,
                   action=argparse.BooleanOptionalAction,
                   help="run phase A ONCE at frame width and feed the "
                        "chunk scan precomputed segments. MEASURED WORSE "
                        "(round 5): 1.74M vs the fused 3.94M rays/s — the "
                        "fused scan overlaps chunk i's march with chunk "
                        "i-1's shading across the dispatch pipeline, and "
                        "the split serializes the whole frame behind one "
                        "phase-A barrier. Kept as the A/B control")
    p.add_argument("--args_mode", action="store_true",
                   help="A/B: pass params+occupancy as traced program "
                        "arguments instead of closure constants (the "
                        "Trainer's programs take them as args)")
    p.add_argument("--args_split", default="both",
                   choices=["both", "params", "occ"],
                   help="with --args_mode: which piece is a traced arg "
                        "(the other stays a closure constant) — isolates "
                        "the 38%% args-mode slowdown")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke tests; never for "
                        "recorded numbers)")
    p.add_argument("--ckpt", default="",
                   help="bench a TRAINED checkpoint instead of the synthetic "
                        "shell workload: loads ema_params + the trained "
                        "occupancy state from a Trainer .npz (the drift/"
                        "quality 30k protocol: bound=1, 4x8 @ 2^17, grid "
                        "128). Validates the synthetic proxy — same render "
                        "programs, real carved occupancy + real densities")
    p.add_argument("--bound", type=float, default=0.0,
                   help="scene bound (0 = auto: 2.0 for the synthetic "
                        "shell, 1.0 with --ckpt — the trained 30k protocol)")
    args = p.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nerfnav_tpu.data.rays import get_all_rays, tile_order
    from nerfnav_tpu.models import (
        NetworkConfig, init_network, make_field, render_rays_grid,
        render_rays_grid_rounds,
    )
    from nerfnav_tpu.ops.marching import MarchConfig
    from nerfnav_tpu.ops.morton import pack_blocks, packbits

    BOUND = args.bound or (1.0 if args.ckpt else 2.0)
    H = W = args.hw
    # TPU-flagship field config: cell-layout hash tables (one wide gather per
    # level instead of 8 narrow ones), 4 levels x 8 features (quarter the
    # gathers of 16x2; measured BEST quality of the three at scale —
    # 27.43 vs 26.47 (8x4) vs 26.26 (16x2) dB, benchmarks/RESULTS.md) + bf16
    # MLP compute
    # density_scale models a CONVERGED scene's opacity: a trained Instant-NGP
    # surface extinguishes a ray within ~4-10 samples (sigma 1e2-1e4 at
    # dt~3e-3), which is what the reference's inference loop exploits by
    # retiring rays at T<1e-4 (raymarching.cu:829-922). The randomly
    # initialized net here has sigma ~O(1), so without the scale the
    # workload would model the one scene class that never occurs in
    # deployment: a fully translucent volume.
    cfg = NetworkConfig(bound=BOUND, mlp_dtype="bfloat16", grid_layout="cell",
                        grid_log2_hashmap_size=args.log2,
                        grid_levels=args.levels, grid_level_dim=args.level_dim,
                        # a trained field carries real densities; the
                        # converged-opacity stand-in is for the random init
                        density_scale=1.0 if args.ckpt else args.density_scale)
    mcfg = MarchConfig(bound=BOUND, grid_size=128, max_steps=1024,
                      samples_per_ray=args.k, min_near=0.2,
                      coarse_normalized=not args.fixed_march,
                      proxy_terminate=args.proxy,
                      coarse_factor=args.coarse_factor,
                      coarse_step_mult=args.coarse_step_mult,
                      coarse_segments=args.coarse_segments,
                      coarse_anchors=args.coarse_anchors,
                      first_k=args.first_k, a0_segments=args.a0,
                      coarse_first_k=args.coarse_first_k,
                      phase_a_group=args.g_a,
                      t_a0_steps=args.t_a0,
                      beam=args.beam,
                      dt_gamma=args.dt_gamma)
    params = init_network(jax.random.PRNGKey(0), cfg)
    Hg = mcfg.grid_size
    f = mcfg.coarse_factor
    hc = Hg // f
    density_grid = None
    if args.ckpt:
        # trained workload: ema_params + the trained occupancy state (carved
        # bitfields, block tables, EMA densities) straight from a Trainer
        # checkpoint — the drift/quality 30k protocol's artifact
        from nerfnav_tpu.models.occupancy import (
            OccupancyConfig, init_occupancy_state,
        )
        from nerfnav_tpu.training.checkpoint import load_checkpoint

        occ_cfg = OccupancyConfig(bound=BOUND, grid_size=Hg,
                                  coarse_factor=f, min_near=mcfg.min_near)
        like = {"ema_params": params,
                "occupancy": init_occupancy_state(occ_cfg)}
        tree, _meta, report = load_checkpoint(args.ckpt, like)
        if report:
            raise SystemExit(f"ckpt load mismatches: {report}")
        params = tree["ema_params"]
        occupancy = {k: tree["occupancy"][k]
                     for k in ("bitfield", "bitfield_coarse",
                               "blocks", "blocks_coarse")}
        occs = [np.unpackbits(np.asarray(occupancy["bitfield"][c]),
                              bitorder="little").astype(bool)
                for c in range(mcfg.cascades)]
        density_grid = np.asarray(tree["occupancy"]["density_grid"])
        print(json.dumps({"ckpt": args.ckpt,
                          "occ_frac": [round(float(o.mean()), 4)
                                       for o in occs]}), flush=True)
    else:
        # converged-style occupancy: shell structure ~6% occupied in cascade 0
        idx = np.arange(Hg**3)
        c = (np.stack([idx // (Hg * Hg), (idx // Hg) % Hg, idx % Hg], -1) + 0.5) / Hg * 2 - 1
        r = np.linalg.norm(c, axis=-1)
        occ0 = ((r > 0.35) & (r < 0.5)) | (np.abs(c[:, 2] + 0.8) < 0.05)  # shell+floor
        occs = [occ0] + [(r < 0.3) for _ in range(1, mcfg.cascades)]
        bitfield = jnp.stack([packbits(jnp.asarray(o.astype(np.float32))) for o in occs])
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
            # block rows: the marcher's gather-lean fast path (coarse 512-bit)
            "blocks": pack_blocks(occ_all, Hg),
            "blocks_coarse": pack_blocks(occ_coarse, hc, block=8),
        }
    if args.beam > 1:
        # beamed phase A tests a 1-cell-dilated coarse table: build it ONCE
        # here (round-5 attribution: rebuilding it inside every marched
        # chunk dominated the beamed phase A)
        from nerfnav_tpu.ops.marching import dilate_blocks_coarse
        from nerfnav_tpu.ops.morton import block_size_of

        occupancy["blocks_coarse_dilated"] = dilate_blocks_coarse(
            occupancy["blocks_coarse"], hc,
            block_size_of(occupancy["blocks_coarse"]))
    if args.table_dtype == "bfloat16":
        params["encoder"] = [t.astype(jnp.bfloat16) for t in params["encoder"]]
    field = make_field(params, cfg)
    crop_aabb = None
    if args.autotune:
        from nerfnav_tpu.data.rays import get_all_rays as _gar, tile_order as _to
        from nerfnav_tpu.ops.marching import autotune_march_shape

        intr_t = jnp.asarray([1000.0, 1000.0, W / 2, H / 2], jnp.float32)
        pose_t = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.0, 0.0, -1.8]))
        rays_t = _gar(pose_t, intr_t, H, W)
        perm_t, _ = _to(H, W, args.tile)
        ro_t = jnp.asarray(np.asarray(rays_t["rays_o"])[perm_t])
        rd_t = jnp.asarray(np.asarray(rays_t["rays_d"])[perm_t])
        # probe on an interior tile chunk (the frame's typical workload)
        mid = (len(perm_t) // args.chunk // 2) * args.chunk
        mcfg, tune = autotune_march_shape(
            occupancy, mcfg, ro_t[mid:], rd_t[mid:], chunk=args.chunk,
            verbose=True)
        print(json.dumps({"autotune": [[g, t, round(ms, 2)]
                                       for g, t, ms in tune],
                          "picked": [mcfg.phase_a_group, mcfg.t_a0_steps]}),
              flush=True)
    elif args.occ_crop:
        import dataclasses

        from nerfnav_tpu.ops.marching import plan_occupied_crop

        aabb, t_a0 = plan_occupied_crop(np.stack(occs), mcfg)
        mcfg = dataclasses.replace(mcfg, t_a0_steps=t_a0)
        crop_aabb = jnp.asarray(aabb)
        print(json.dumps({"occ_crop_aabb": [round(float(v), 3) for v in aabb],
                          "t_a0_steps": t_a0}), flush=True)
    elif args.occ_ladder and args.dt_gamma == 0.0:
        import dataclasses

        from nerfnav_tpu.ops.marching import plan_occupied_ladder

        t_a0 = plan_occupied_ladder(np.stack(occs), mcfg)
        if t_a0:
            mcfg = dataclasses.replace(mcfg, t_a0_steps=t_a0)
        print(json.dumps({"occ_ladder_t_a0": t_a0}), flush=True)
    elif args.occ_ladder:
        # gamma analogue: bound the static gamma ladder's SPAN by the
        # occupied AABB (plan_gamma_span) — same exact corner-distance bound,
        # world units because gamma steps are non-uniform
        import dataclasses

        from nerfnav_tpu.ops.marching import plan_gamma_span

        span = plan_gamma_span(np.stack(occs), mcfg)
        if span:
            mcfg = dataclasses.replace(mcfg, gamma_span=span)
        print(json.dumps({"gamma_span": round(span, 4),
                          "gamma_steps": len(mcfg.coarse_gamma_ladder[0])}),
              flush=True)

    if args.proxy:
        # segment-termination table: min-pooled SCALED density (sigma ~O(1)
        # x density_scale in occupied cells — a ray extinguishes within ~4-5
        # samples, the converged-scene behavior the termination exploits).
        # A trained checkpoint supplies REAL EMA densities instead.
        dens = (np.clip(density_grid, 0.0, None)
                if density_grid is not None
                else np.stack(occs).astype(np.float32) * args.density_scale)
        occupancy["density_coarse_min"] = jnp.asarray(
            dens.reshape(-1, hc, f, hc, f, hc, f).min(axis=(2, 4, 6))
            .reshape(len(occs), -1))

    intr = jnp.asarray([1000.0, 1000.0, W / 2, H / 2], jnp.float32)

    # default: on-axis framing (the headline metric). --yaw rotates the
    # camera around the scene's Y axis at the same distance — an off-axis
    # A/B framing, never the headline number
    th = np.radians(args.yaw)
    rot_y = np.array([[np.cos(th), 0, np.sin(th)],
                      [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]], np.float32)
    pose = jnp.eye(4)
    pose = pose.at[:3, :3].set(jnp.asarray(rot_y))
    pose = pose.at[:3, 3].set(jnp.asarray(
        [-1.8 * np.sin(th), 0.0, -1.8 * np.cos(th)], dtype=np.float32))
    rays = get_all_rays(pose, intr, H, W)

    # smaller chunks keep more programs in flight through the dispatch
    # pipeline — latency-bound gathers overlap (measured sweep 2k..128k:
    # 4096 is the knee). Chunks are 64x64 image TILES (not row strips) so
    # the rounds renderer's all-dead early exit fires per tile.
    CHUNK = args.chunk
    perm, _inv = tile_order(H, W, args.tile)

    # rounds is the flagship: chip A/B 1310k vs 1087k rays/s (the lax.conds
    # stay on-device and do NOT serialize the 157-chunk dispatch pipeline;
    # an earlier contrary measurement was contaminated by a concurrent
    # process plus a second program shape compiling inside the timed loop)
    if args.path == "rounds":
        def _rounds_out(fld, occ, ro, rd, phase_a=None):
            out = render_rays_grid_rounds(
                fld, occ, mcfg, ro, rd, bg_color=1.0,
                round_samples=args.round_samples,
                round_compact=args.round_compact,
                shade_order=args.shade_order,
                crop_aabb=crop_aabb,
                phase_a=phase_a,
            )
            if args.depth_out:
                return out["image"], out["depth"]
            return out["image"]

        # the Trainer-product-path shape passes params/occupancy as traced
        # args (and re-derives the field inside the trace); --args_mode
        # mimics it for attribution. Only meaningful under --scan.
        from nerfnav_tpu.models import make_field as _mk

        if args.args_split == "params":
            inner_args = (lambda p, occ, ro, rd:
                          _rounds_out(_mk(p, cfg), occupancy, ro, rd))
        elif args.args_split == "occ":
            inner_args = (lambda p, occ, ro, rd:
                          _rounds_out(field, occ, ro, rd))
        else:
            inner_args = (lambda p, occ, ro, rd:
                          _rounds_out(_mk(p, cfg), occ, ro, rd))
        inner = lambda ro, rd: _rounds_out(field, occupancy, ro, rd)  # noqa: E731
        if args.nested_jit:
            inner = jax.jit(inner)
            inner_args = jax.jit(inner_args)
        render_chunk = jax.jit(inner)
    else:
        @jax.jit
        def render_chunk(ro, rd):
            return render_rays_grid(
                field, occupancy, mcfg, ro, rd, bg_color=1.0,
                crop_aabb=crop_aabb,
            )["image"]

    n = H * W
    if args.row_major:
        pad = (-n) % CHUNK
        ro = jnp.pad(rays["rays_o"], ((0, pad), (0, 0)))
        rd = jnp.pad(rays["rays_d"], ((0, pad), (0, 0)), constant_values=1.0)
        chunks = [(ro[i : i + CHUNK], rd[i : i + CHUNK])
                  for i in range(0, n + pad, CHUNK)]
    else:
        # pad to whole chunks: a second (short) chunk shape would compile a
        # second program — through the remote-compile relay that lands
        # MINUTES inside the first timed frame
        pad = (-n) % CHUNK
        ro = np.concatenate([np.asarray(rays["rays_o"])[perm],
                             np.zeros((pad, 3), np.float32)])
        rd = np.concatenate([np.asarray(rays["rays_d"])[perm],
                             np.ones((pad, 3), np.float32)])
        ro, rd = jnp.asarray(ro), jnp.asarray(rd)
        chunks = [(ro[i : i + CHUNK], rd[i : i + CHUNK])
                  for i in range(0, n + pad, CHUNK)]

    if args.scan:
        # whole-frame single dispatch: every chunk marched+shaded by ONE
        # jitted lax.map program (the rounds early-exit conds still fire
        # per chunk inside the map). A/B against the pipelined per-chunk
        # dispatch above; round-1 march-only lax.map was at par (143 vs
        # 150 ms) BEFORE shading rode along.
        ro_s = ro.reshape(-1, CHUNK, 3)
        rd_s = rd.reshape(-1, CHUNK, 3)

        if args.frame_phase_a and args.path == "rounds":
            from nerfnav_tpu.ops import marching as _M

            @jax.jit
            def render_frame_scan_pa(ro_s, rd_s):
                C, CH, _ = ro_s.shape
                mA = _M.march(ro_s.reshape(-1, 3), rd_s.reshape(-1, 3),
                              occupancy, mcfg, crop_aabb=crop_aabb,
                              stop_after="phase_a")
                za = mA["z"].reshape(C, CH, -1)
                dta = mA["dt"].reshape(C, CH, -1)
                va = mA["valid"].reshape(C, CH, -1)

                def body(ab):
                    ro_c, rd_c, z_c, d_c, v_c = ab
                    return _rounds_out(field, occupancy, ro_c, rd_c,
                                       phase_a={"z": z_c, "dt": d_c,
                                                "valid": v_c})

                return jax.lax.map(body, (ro_s, rd_s, za, dta, va))

            frame = lambda: render_frame_scan_pa(ro_s, rd_s)  # noqa: E731
        elif args.args_mode and args.path == "rounds":
            @jax.jit
            def render_frame_scan_a(p, occ, ro_s, rd_s):
                return jax.lax.map(
                    lambda ab: inner_args(p, occ, ab[0], ab[1]),
                    (ro_s, rd_s))

            frame = lambda: render_frame_scan_a(  # noqa: E731
                params, occupancy, ro_s, rd_s)
        else:
            @jax.jit
            def render_frame_scan(ro_s, rd_s):
                return jax.lax.map(
                    lambda ab: render_chunk(ab[0], ab[1]), (ro_s, rd_s))

            frame = lambda: render_frame_scan(ro_s, rd_s)  # noqa: E731

        warm = frame()
        jax.block_until_ready(warm)
        # empty-render guard: a march trim that (incorrectly) kills every
        # ray renders pure background at absurd speed — beam 16 measured
        # 12.9e9 rays/s exactly this way (contract violation; RESULTS.md
        # round 4). mean_image == bg (1.0) flags it in the recorded line.
        img_w = warm[0] if isinstance(warm, tuple) else warm
        mean_image = round(float(jnp.mean(img_w)), 4)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(frame())
        dt = (time.perf_counter() - t0) / iters
        rays_per_sec = n / dt
        print(json.dumps({
            "metric": "render_rays_per_sec_chip",
            "value": round(rays_per_sec),
            "unit": "rays/s",
            "vs_baseline": round(rays_per_sec / 1e7, 3),
            "mean_image": mean_image,
        }))
        return

    # warmup/compile
    jax.block_until_ready(render_chunk(*chunks[0]))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        outs = [render_chunk(a, b) for a, b in chunks]
        jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    rays_per_sec = n / dt

    print(json.dumps({
        "metric": "render_rays_per_sec_chip",
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / 1e7, 3),
    }))


if __name__ == "__main__":
    main()
