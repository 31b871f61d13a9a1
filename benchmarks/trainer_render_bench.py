"""Render throughput through the PRODUCT path: Trainer.render_full.

bench.py measures the renderer through its own hand-built dispatch loop;
this probe measures the same flagship scene through the Trainer's
render_full — the exact code path `main_nerf --test`, evaluate(), test(),
and the GUI drive. Round-3 VERDICT item 1's Done criterion: this number
must land within 10% of bench.py's.

The product defaults ARE the bench-adopted config (TrainerOptions:
eval_scan, eval_occ_ladder, eval_table_dtype=bfloat16, eval trims
seg12/anch2, rounds shading over 64x64 tiles); flags let each be switched
off for attribution.

Run: python benchmarks/trainer_render_bench.py [--hw 800] [--iters 5]
"""

import argparse
import json
import time

import numpy as np

from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hw", type=int, default=800)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--chunk", type=int, default=4096)
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--density_scale", type=float, default=300.0)
    p.add_argument("--scan", default=True, action=argparse.BooleanOptionalAction)
    p.add_argument("--occ_ladder", default=True,
                   action=argparse.BooleanOptionalAction)
    p.add_argument("--table_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--eval_segments", type=int, default=12)
    p.add_argument("--eval_anchors", type=int, default=2)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--inner", action="store_true",
                   help="also time the bare whole-frame scan dispatch on "
                        "prebuilt rays (attribution: host frame assembly "
                        "vs program speed)")
    p.add_argument("--frozen", action="store_true",
                   help="render_full(frozen=True): params/occupancy baked "
                        "as program constants (the post-training product "
                        "path; chip A/B vs the traced-args default)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nerfnav_tpu.models import NetworkConfig, RenderConfig
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.ops.marching import MarchConfig
    from nerfnav_tpu.ops.morton import pack_blocks, packbits
    from nerfnav_tpu.training import Trainer, TrainerOptions

    BOUND = 2.0
    H = W = args.hw
    cfg = NetworkConfig(bound=BOUND, mlp_dtype="bfloat16", grid_layout="cell",
                        grid_log2_hashmap_size=17, grid_levels=4,
                        grid_level_dim=8, density_scale=args.density_scale)
    mcfg = MarchConfig(bound=BOUND, grid_size=128, max_steps=1024,
                       samples_per_ray=args.k, min_near=0.2)
    rcfg = RenderConfig(num_steps=128, upsample_steps=0, min_near=0.2,
                        max_ray_batch=args.chunk)
    opt = TrainerOptions(
        name="tr_bench", workspace="/tmp/nerfnav_tr_bench",
        use_checkpoint="scratch",
        eval_scan=args.scan, eval_occ_ladder=args.occ_ladder,
        eval_table_dtype=args.table_dtype,
        eval_coarse_segments=args.eval_segments,
        eval_coarse_anchors=args.eval_anchors,
    )
    occ_cfg = OccupancyConfig(bound=BOUND, grid_size=128, min_near=0.2)
    tr = Trainer(cfg, rcfg, opt, occupancy_cfg=occ_cfg, march_cfg=mcfg)
    tr.state = tr._init_state(1)

    # bench.py's converged-style shell occupancy, injected into the state
    Hg = mcfg.grid_size
    idx = np.arange(Hg**3)
    c = (np.stack([idx // (Hg * Hg), (idx // Hg) % Hg, idx % Hg], -1) + 0.5) / Hg * 2 - 1
    r = np.linalg.norm(c, axis=-1)
    occ0 = ((r > 0.35) & (r < 0.5)) | (np.abs(c[:, 2] + 0.8) < 0.05)
    occs = [occ0] + [(r < 0.3) for _ in range(1, mcfg.cascades)]
    f = mcfg.coarse_factor
    hc = Hg // f
    occ_all = jnp.asarray(np.stack(occs))
    occ_coarse = jnp.asarray(np.stack([
        o.reshape(hc, f, hc, f, hc, f).max(axis=(1, 3, 5)).reshape(-1)
        for o in occs
    ]))
    st = dict(tr.state.occupancy)
    st["bitfield"] = packbits(occ_all.astype(jnp.float32))
    st["bitfield_coarse"] = packbits(occ_coarse.astype(jnp.float32))
    st["blocks"] = pack_blocks(occ_all, Hg)
    st["blocks_coarse"] = pack_blocks(occ_coarse, hc, block=8)
    tr.state = tr.state._replace(occupancy=st)
    tr._occ_version += 1

    intr = np.asarray([1000.0, 1000.0, W / 2, H / 2], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -1.8
    params = tr.state.params

    # warmup: compile every program render_full uses (plan + scan/chunks)
    img, _ = tr.render_full(params, pose, intr, H, W, bg_color=1.0,
                            frozen=args.frozen)
    np.asarray(img)
    print(json.dumps({"ladder_plan": tr._ladder_plan,
                      "frozen": args.frozen}), flush=True)

    if args.inner:
        # attribution: time ONLY the compiled whole-frame scan dispatch on
        # prebuilt ray stacks — separates render_full's per-call frame
        # assembly (ray gen dispatch, inv gather, casts) from the program
        # itself. bench.py's loop is exactly this inner shape.
        chunk = args.chunk
        tc = tr._tile_layout(H, W, chunk)
        ro, rd = tr._tile_ray_fn(
            jnp.asarray(pose, jnp.float32), jnp.asarray(intr, jnp.float32),
            tc["i"], tc["j"], jnp.zeros((2,), jnp.float32))
        ro_s = ro.reshape(-1, chunk, 3)
        rd_s = rd.reshape(-1, chunk, 3)
        p_eval = tr._cast_eval_tables(params) \
            if args.table_dtype != "float32" else params
        occ = tr.state.occupancy
        t_a0 = tr._planned_ladder(occ)
        fn = tr._render_scan_fn(t_a0)
        out = fn(p_eval, occ, ro_s, rd_s, 1.0, None)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(p_eval, occ, ro_s, rd_s, 1.0, None)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "metric": "trainer_render_scan_inner_rays_per_sec",
            "value": round(H * W / dt),
            "unit": "rays/s",
            "vs_baseline": round(H * W / dt / 1e7, 3),
        }), flush=True)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        img, _ = tr.render_full(params, pose, intr, H, W, bg_color=1.0,
                                frozen=args.frozen)
        jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / args.iters
    rays_per_sec = H * W / dt

    print(json.dumps({
        "metric": "trainer_render_full_rays_per_sec",
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / 1e7, 3),
    }))


if __name__ == "__main__":
    main()
