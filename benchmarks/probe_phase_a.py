"""Sub-stage timing of the block marcher's phase A on the real chip.

profile_render.py shows phase A alone at ~129 ms/frame (48% of the flagship
frame) — this probe splits that into: ladder+coords elementwise math, the
anchor-row gathers, bit extraction, and compaction, plus a one-hot MXU
row-fetch variant (dot(onehot(idx), table) — the idiomatic TPU alternative
to gathers into SMALL tables; the coarse block table is ~128 rows).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_phase_a.py
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
    ap.add_argument("--coarse_segments", type=int, default=12)
    ap.add_argument("--coarse_anchors", type=int, default=2)
    args = ap.parse_args()

    BOUND = 2.0
    H = W = args.res
    mcfg = M.MarchConfig(bound=BOUND, grid_size=128, max_steps=1024,
                         samples_per_ray=32, min_near=0.2,
                         coarse_segments=args.coarse_segments,
                         coarse_anchors=args.coarse_anchors)

    Hg = mcfg.grid_size
    idx = np.arange(Hg**3)
    c = (np.stack([idx // (Hg * Hg), (idx // Hg) % Hg, idx % Hg], -1) + 0.5) / Hg * 2 - 1
    r = np.linalg.norm(c, axis=-1)
    occ0 = ((r > 0.35) & (r < 0.5)) | (np.abs(c[:, 2] + 0.8) < 0.05)
    occs = [occ0] + [(r < 0.3) for _ in range(1, mcfg.cascades)]
    f = mcfg.coarse_factor
    hc = Hg // f
    occ_coarse = jnp.asarray(np.stack([
        o.reshape(hc, f, hc, f, hc, f).max(axis=(1, 3, 5)).reshape(-1)
        for o in occs
    ]))
    blocks_coarse = pack_blocks(occ_coarse, hc, block=8)

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
    ro_s = ro.reshape(-1, CHUNK, 3)
    rd_s = rd.reshape(-1, CHUNK, 3)

    # shared geometry (mirrors march_rays_block phase A)
    tbl = blocks_coarse.reshape(-1, blocks_coarse.shape[-1])
    R, Wd = tbl.shape
    bc = block_size_of(blocks_coarse)
    c0 = min(1.0, mcfg.bound)
    base = mcfg.dt_min * mcfg.coarse_step_mult
    dt_a_max = M._phase_a_cap(mcfg)
    sb_world = bc * 2.0 * c0 / hc
    g_a = max(1, min(int(1.5 * sb_world / dt_a_max), 32))
    anchors = [0, g_a - 1] if (args.coarse_anchors == 2 and g_a > 1) else None
    print(f"table rows={R} words={Wd} g_a={g_a} anchors={anchors}")

    # bf16-byte view of the table for the one-hot MXU fetch
    shifts = np.arange(4, dtype=np.uint32) * 8
    tbl_np = np.asarray(tbl)
    tbl_bytes = ((tbl_np[:, :, None] >> shifts[None, None]) & 0xFF)
    tbl_bytes = jnp.asarray(
        tbl_bytes.reshape(R, 4 * Wd).astype(np.float32), jnp.bfloat16)

    def ladder(a, b):
        near, far = M.near_far_aabb(a, b, mcfg.bound, mcfg.min_near)
        z_a, dt_a, t_a = M._phase_a_ladder(near, far, mcfg, round_to=g_a)
        pos_a = a[:, None, :] + b[:, None, :] * z_a[..., None]
        flat_a, local_a = M._block_coords(pos_a, dt_a, hc, mcfg, block=bc)
        return near, far, z_a, flat_a, local_a

    @jax.jit
    def s_ladder(a, b):
        near, far, z_a, flat_a, local_a = ladder(a, b)
        return flat_a.sum() + local_a.sum() + z_a.sum()

    @jax.jit
    def s_gather_only(a, b):
        _, _, _, flat_a, _ = ladder(a, b)
        nn, t = flat_a.shape
        fa = flat_a.reshape(nn, t // g_a, g_a)
        acc = 0.0
        for an in (anchors or [0]):
            rows = jnp.take(tbl, fa[:, :, an].reshape(-1), axis=0)
            acc = acc + rows.sum()
        return acc

    @jax.jit
    def s_fake_bits(a, b):
        # full phase A with the gather replaced by a data-free fake row
        near, far, z_a, flat_a, local_a = ladder(a, b)
        nn, t = flat_a.shape
        f2 = flat_a.reshape(nn, t // g_a, g_a)
        l2 = local_a.reshape(nn, t // g_a, g_a)
        occ = jnp.ones(f2.shape, bool)
        matched = jnp.zeros(f2.shape, bool)
        for an in (anchors or [0]):
            fa = f2[:, :, an]
            rows = (fa[:, :, None] * jnp.arange(Wd, dtype=jnp.int32)[None, None]
                    ).astype(jnp.uint32)  # fake, no memory touch
            hit = f2 == fa[:, :, None]
            bit = block_bit_lookup(rows[:, :, None, :], l2)
            occ = jnp.where(hit & ~matched, bit, occ)
            matched = matched | hit
        occ = occ.reshape(nn, t)
        occ = (occ | jnp.concatenate(
            [occ[:, 1:], jnp.zeros_like(occ[:, :1])], axis=1)) \
            & (z_a < far[:, None])
        i, v, s = M._compact_idx(occ, mcfg.coarse_segments)
        return i.sum() + v.sum() + s.sum()

    @jax.jit
    def s_full(a, b):
        near, far, z_a, flat_a, local_a = ladder(a, b)
        occ = M._grouped_block_test(tbl, flat_a, local_a, g_a, anchors=anchors)
        occ = (occ | jnp.concatenate(
            [occ[:, 1:], jnp.zeros_like(occ[:, :1])], axis=1)) \
            & (z_a < far[:, None])
        i, v, s = M._compact_idx(occ, mcfg.coarse_segments)
        return i.sum() + v.sum() + s.sum()

    @jax.jit
    def s_onehot(a, b):
        # full phase A, rows fetched via dot(onehot(idx), byte_table)
        near, far, z_a, flat_a, local_a = ladder(a, b)
        nn, t = flat_a.shape
        f2 = flat_a.reshape(nn, t // g_a, g_a)
        l2 = local_a.reshape(nn, t // g_a, g_a)
        occ = jnp.ones(f2.shape, bool)
        matched = jnp.zeros(f2.shape, bool)
        for an in (anchors or [0]):
            fa = f2[:, :, an]
            oh = jax.nn.one_hot(fa.reshape(-1), R, dtype=jnp.bfloat16)
            by = jax.lax.dot_general(
                oh, tbl_bytes, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            by = by.astype(jnp.int32).reshape(nn, t // g_a, 4 * Wd)
            # byte select tree + bit extract
            bidx = (l2.astype(jnp.uint32) >> 3).astype(jnp.uint32)
            level = [by[:, :, w][:, :, None] for w in range(4 * Wd)]
            # broadcast each byte over the g positions lazily via where tree
            lvl = [jnp.broadcast_to(x, l2.shape) for x in level]
            bitp = 0
            while len(lvl) > 1:
                pick_hi = (bidx >> bitp) & 1 > 0
                lvl = [jnp.where(pick_hi, lvl[2 * i + 1], lvl[2 * i])
                       for i in range(len(lvl) // 2)]
                bitp += 1
            byte = lvl[0]
            bit = ((byte >> (l2 & 7)) & 1) > 0
            hit = f2 == fa[:, :, None]
            occ = jnp.where(hit & ~matched, bit, occ)
            matched = matched | hit
        occ = occ.reshape(nn, t)
        occ = (occ | jnp.concatenate(
            [occ[:, 1:], jnp.zeros_like(occ[:, :1])], axis=1)) \
            & (z_a < far[:, None])
        i, v, s = M._compact_idx(occ, mcfg.coarse_segments)
        return i.sum() + v.sum() + s.sum()

    @jax.jit
    def s_barrier(a, b):
        # full phase A (take) with an optimization barrier after the row
        # gather: if XLA is fusing the gather into the 16-word select tree
        # (re-gathering per word), the barrier forces ONE row gather into a
        # materialized buffer and the tree runs on VMEM values.
        near, far, z_a, flat_a, local_a = ladder(a, b)
        nn, t = flat_a.shape
        f2 = flat_a.reshape(nn, t // g_a, g_a)
        l2 = local_a.reshape(nn, t // g_a, g_a)
        occ = jnp.ones(f2.shape, bool)
        matched = jnp.zeros(f2.shape, bool)
        for an in (anchors or [0]):
            fa = f2[:, :, an]
            rows = jnp.take(tbl, fa.reshape(-1), axis=0)
            rows = jax.lax.optimization_barrier(rows)
            rows = rows.reshape(nn, t // g_a, Wd)
            hit = f2 == fa[:, :, None]
            bit = block_bit_lookup(rows[:, :, None, :], l2)
            occ = jnp.where(hit & ~matched, bit, occ)
            matched = matched | hit
        occ = occ.reshape(nn, t)
        occ = (occ | jnp.concatenate(
            [occ[:, 1:], jnp.zeros_like(occ[:, :1])], axis=1)) \
            & (z_a < far[:, None])
        i, v, s = M._compact_idx(occ, mcfg.coarse_segments)
        return i.sum() + v.sum() + s.sum()

    blocks_coarse4 = pack_blocks(occ_coarse, hc, block=4)
    tbl4 = blocks_coarse4.reshape(-1, blocks_coarse4.shape[-1])
    sb4 = 4 * 2.0 * c0 / hc
    g_a4 = max(1, min(int(1.5 * sb4 / dt_a_max), 32))
    anchors4 = [0, g_a4 - 1] if g_a4 > 1 else None
    print(f"block4 table rows={tbl4.shape[0]} words={tbl4.shape[1]} "
          f"g_a4={g_a4}")

    def ladder4(a, b):
        near, far = M.near_far_aabb(a, b, mcfg.bound, mcfg.min_near)
        z_a, dt_a, t_a = M._phase_a_ladder(near, far, mcfg, round_to=g_a4)
        pos_a = a[:, None, :] + b[:, None, :] * z_a[..., None]
        flat_a, local_a = M._block_coords(pos_a, dt_a, hc, mcfg, block=4)
        return near, far, z_a, flat_a, local_a

    @jax.jit
    def s_block4(a, b):
        near, far, z_a, flat_a, local_a = ladder4(a, b)
        occ = M._grouped_block_test(tbl4, flat_a, local_a, g_a4,
                                    anchors=anchors4)
        occ = (occ | jnp.concatenate(
            [occ[:, 1:], jnp.zeros_like(occ[:, :1])], axis=1)) \
            & (z_a < far[:, None])
        i, v, s = M._compact_idx(occ, mcfg.coarse_segments)
        return i.sum() + v.sum() + s.sum()

    # correctness cross-check (tiny batch) before timing
    a0, b0 = ro_s[40], rd_s[40]
    ref = s_full(a0, b0)
    oh = s_onehot(a0, b0)
    print("onehot-vs-take compact sums:", float(ref), float(oh))

    def bench(fn, name):
        scanned = jax.jit(lambda a_s, b_s: jax.lax.map(
            lambda ab: fn(ab[0], ab[1]), (a_s, b_s)).sum())
        scanned(ro_s, rd_s).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            scanned(ro_s, rd_s).block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:26s} {dt * 1e3:8.1f} ms/frame")
        return dt

    ref_b = s_barrier(a0, b0)
    print("barrier-vs-take compact sums:", float(ref), float(ref_b))

    bench(s_ladder, "ladder+coords only")
    bench(s_gather_only, "ladder+anchor gathers")
    bench(s_fake_bits, "full A, fake rows")
    bench(s_full, "full A (take)")
    bench(s_barrier, "full A (take+barrier)")
    bench(s_block4, "full A (block=4 table)")


if __name__ == "__main__":
    main()
