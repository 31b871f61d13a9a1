"""Decompose the block marcher's phase A + measure dispatch overhead.

Stages (same ray workload as bench.py, trimmed config):
  dispatch floor     trivial program x 157 chunks (relay dispatch cost)
  ladder+pos         phase-A ladder and positions only
  +coords            + block/cell coordinate math
  +gathers           + anchor row gathers (no bit extract)
  +extract           + bit extraction (= occupancy bits)
  phase A full       + endpoint-or + segment compaction
  march lax.map      full march, ONE dispatch for the whole frame

Inputs are rolled across iterations so the relay's identical-execution cache
cannot serve a repeat.
"""
import argparse
import time

import numpy as np

from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp

    from nerfnav_tpu.data.rays import get_all_rays, tile_order
    from nerfnav_tpu.ops import marching as M
    from nerfnav_tpu.ops.morton import (
        block_bit_lookup, block_size_of, pack_blocks, packbits,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--anchors", type=int, default=2)
    args = ap.parse_args()

    BOUND = 2.0
    H = W = args.res
    mcfg = M.MarchConfig(bound=BOUND, grid_size=128, max_steps=1024,
                         samples_per_ray=32, min_near=0.2,
                         coarse_segments=args.segments,
                         coarse_anchors=args.anchors)
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
    bitfield = jnp.stack([packbits(jnp.asarray(o.astype(np.float32))) for o in occs])
    coarse = jnp.stack([
        packbits(jnp.asarray(
            o.reshape(hc, f, hc, f, hc, f).max(axis=(1, 3, 5)).reshape(-1)
            .astype(np.float32)))
        for o in occs
    ])
    occupancy = {
        "bitfield": bitfield,
        "bitfield_coarse": coarse,
        "blocks": pack_blocks(occ_all, Hg),
        "blocks_coarse": pack_blocks(occ_coarse, hc, block=8),
    }
    blocks_coarse = occupancy["blocks_coarse"]
    bc = block_size_of(blocks_coarse)
    c0 = min(1.0, mcfg.bound)
    base = mcfg.dt_min * mcfg.coarse_step_mult
    dt_a_max = M._phase_a_cap(mcfg)
    sb_world = bc * 2.0 * c0 / hc
    g_a = max(1, min(int(1.5 * sb_world / dt_a_max), 32))
    anchors = [0, g_a - 1]
    tbl = blocks_coarse.reshape(-1, blocks_coarse.shape[-1])

    intr = jnp.asarray([1000.0, 1000.0, W / 2, H / 2], jnp.float32)
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.0, 0.0, -1.8]))
    rays = get_all_rays(pose, intr, H, W)
    CHUNK = args.chunk
    n = H * W
    pad = (-n) % CHUNK
    perm, _ = tile_order(H, W, 64)
    ro = jnp.asarray(np.concatenate([np.asarray(rays["rays_o"])[perm],
                                     np.zeros((pad, 3), np.float32)]))
    rd = jnp.asarray(np.concatenate([np.asarray(rays["rays_d"])[perm],
                                     np.ones((pad, 3), np.float32)]))
    n_chunks = (n + pad) // CHUNK
    chunks = [(ro[i * CHUNK:(i + 1) * CHUNK], rd[i * CHUNK:(i + 1) * CHUNK])
              for i in range(n_chunks)]

    # ---- stage programs (each returns a scalar depending on all live work)
    @jax.jit
    def disp_floor(a, b):
        return a[0, 0] + b[0, 0]

    @jax.jit
    def s_nearfar(a, b):
        near, far = M.near_far_aabb(a, b, mcfg.bound, mcfg.min_near)
        return near.sum() + far.sum()

    @jax.jit
    def s_zladder(a, b):
        near, far = M.near_far_aabb(a, b, mcfg.bound, mcfg.min_near)
        z_a, dt_a, t_a = M._phase_a_ladder(near, far, mcfg, round_to=g_a)
        return z_a.sum() + dt_a.sum()

    def ladder(a, b):
        near, far = M.near_far_aabb(a, b, mcfg.bound, mcfg.min_near)
        z_a, dt_a, t_a = M._phase_a_ladder(near, far, mcfg, round_to=g_a)
        pos_a = a[:, None, :] + b[:, None, :] * z_a[..., None]
        return near, far, z_a, dt_a, pos_a

    @jax.jit
    def s_ladder(a, b):
        near, far, z_a, dt_a, pos_a = ladder(a, b)
        return pos_a.sum()

    @jax.jit
    def s_coords(a, b):
        near, far, z_a, dt_a, pos_a = ladder(a, b)
        flat, local = M._block_coords(pos_a, dt_a, hc, mcfg, block=bc)
        return flat.sum() + local.sum()

    def gather_rows(a, b):
        near, far, z_a, dt_a, pos_a = ladder(a, b)
        flat, local = M._block_coords(pos_a, dt_a, hc, mcfg, block=bc)
        nn, t = flat.shape
        fv = flat.reshape(nn, t // g_a, g_a)
        lv = local.reshape(nn, t // g_a, g_a)
        rows = [jnp.take(tbl, fv[:, :, a_].reshape(-1), axis=0)
                .reshape(nn, t // g_a, tbl.shape[-1]) for a_ in anchors]
        return fv, lv, rows

    @jax.jit
    def s_gathers(a, b):
        fv, lv, rows = gather_rows(a, b)
        return sum(r.astype(jnp.uint64).sum() for r in rows)

    @jax.jit
    def s_extract(a, b):
        fv, lv, rows = gather_rows(a, b)
        occ = jnp.ones(fv.shape, bool)
        matched = jnp.zeros(fv.shape, bool)
        for a_, rws in zip(anchors, rows):
            fa = fv[:, :, a_]
            hit = fv == fa[:, :, None]
            bit = block_bit_lookup(rws[:, :, None, :], lv)
            occ = jnp.where(hit & ~matched, bit, occ)
            matched = matched | hit
        return occ.sum()

    @jax.jit
    def s_phase_a(a, b):
        near, far = M.near_far_aabb(a, b, mcfg.bound, mcfg.min_near)
        z_a, dt_a, t_a = M._phase_a_ladder(near, far, mcfg, round_to=g_a)
        pos_a = a[:, None, :] + b[:, None, :] * z_a[..., None]
        flat, local = M._block_coords(pos_a, dt_a, hc, mcfg, block=bc)
        occ_a = M._grouped_block_test(tbl, flat, local, g_a, anchors=anchors)
        occ_next = jnp.concatenate(
            [occ_a[:, 1:], jnp.zeros_like(occ_a[:, :1])], axis=1)
        occ_a = (occ_a | occ_next) & (z_a < far[:, None])
        idx_a, valid_a, stride_a = M._compact_idx(occ_a, mcfg.coarse_segments)
        return idx_a.sum() + valid_a.sum() + stride_a.sum()

    @jax.jit
    def s_march_map(ro_all, rd_all):
        def one(ab):
            a, b = ab
            m = M.march(a, b, occupancy, mcfg)
            return (m["z"] + m["dt"] + m["valid"]).sum()

        return jax.lax.map(one, (ro_all, rd_all)).sum()

    ro_st = ro.reshape(n_chunks, CHUNK, 3)
    rd_st = rd.reshape(n_chunks, CHUNK, 3)

    def bench(fn, name, stacked=False):
        if stacked:
            fn(ro_st, rd_st).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.iters):
                fn(ro_st, rd_st).block_until_ready()
            dt = (time.perf_counter() - t0) / args.iters
        else:
            fn(*chunks[0]).block_until_ready()
            t0 = time.perf_counter()
            for it in range(args.iters):
                outs = [fn(*chunks[(i + it) % n_chunks]) for i in range(n_chunks)]
                jax.block_until_ready(outs[-1])
            dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:20s} {dt * 1e3:8.1f} ms/frame", flush=True)
        return dt

    bench(disp_floor, "dispatch floor")
    bench(s_nearfar, "near/far")
    bench(s_zladder, "z ladder")
    bench(s_ladder, "ladder+pos")
    bench(s_coords, "+coords")
    bench(s_gathers, "+gathers")
    bench(s_extract, "+extract")
    bench(s_phase_a, "phase A full")
    bench(s_march_map, "march lax.map x1", stacked=True)


if __name__ == "__main__":
    main()
