"""Decompose the training backward: hash-table scatter strategies.

The train step's backward is dominated by the hash-grid scatter-add
(d(take) = scatter). This probe times, on identical data:

  fwd encode           control (4-level cell-layout encode)
  grad wrt x only      backward WITHOUT table grads (is scatter the cost?)
  grad tables (xla)    current path: XLA scatter-add per level
  grad tables (sort)   sort + cumsum-diff segment rows + unique scatter
  grad tables (matmul) one-hot matmul (dense small levels only)
  grad full loss       value_and_grad of an MSE through sigma (ratio anchor)

Workload: the packed-shading regime — `--n` budget points (default 16384),
positions on a shell. Fresh positions per iteration (relay cache defeat).
"""
import argparse
import time

import numpy as np

from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp

    from nerfnav_tpu.models import NetworkConfig, init_network
    from nerfnav_tpu.models import network as net
    from nerfnav_tpu.ops.hashgrid import (
        HashGridConfig, _cell_indices, hash_grid_encode,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force local CPU (the JAX_PLATFORMS env var is too "
                         "late: the container pre-imports jax on axon)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    BOUND = 2.0
    cfg = NetworkConfig(bound=BOUND, mlp_dtype="bfloat16", grid_layout="cell",
                        grid_log2_hashmap_size=17, grid_levels=4,
                        grid_level_dim=8)
    params = init_network(jax.random.PRNGKey(0), cfg)
    gcfg = cfg.grid
    tables = params["encoder"]

    n = args.n
    rng = np.random.default_rng(0)

    def fresh_pts(i):
        r = np.random.default_rng(i + 1)
        p = r.normal(size=(n, 3)).astype(np.float32)
        p /= np.linalg.norm(p, axis=-1, keepdims=True) + 1e-6
        p *= r.uniform(0.35, 0.5, (n, 1)).astype(np.float32)
        return jnp.asarray(p)

    pts_pool = [fresh_pts(i) for i in range(args.iters + 1)]

    # ---- encode fns
    def enc(tbls, x):
        return hash_grid_encode(tbls, x, gcfg, bound=BOUND)

    @jax.jit
    def f_fwd(x):
        return enc(tables, x).sum()

    @jax.jit
    def f_gx(x):
        return jax.grad(lambda xx: enc(tables, xx).sum())(x).sum()

    @jax.jit
    def f_gt_xla(x):
        g = jax.grad(lambda t: enc(t, x).sum())(tables)
        return sum(t.sum() for t in g)

    # ---- bf16 scatter variant: take from bf16 tables so the backward
    # scatter-add runs on bf16 rows (half the scattered bytes; per-row cost
    # question). Master tables would stay fp32 and receive the cast-up sum.
    tables_bf16 = [t.astype(jnp.bfloat16) for t in tables]

    @jax.jit
    def f_gt_bf16(x):
        def loss(t):
            return enc(t, x).astype(jnp.float32).sum()

        g = jax.grad(loss)(tables_bf16)
        return sum(t.astype(jnp.float32).sum() for t in g)

    # ---- sort-based manual table grad (per level)
    def table_grad_sort(x):
        x01 = (x + BOUND) / (2 * BOUND)
        x01c = jnp.clip(x01, 0.0, 1.0)
        outs = []
        d = gcfg.input_dim
        nc = 2 ** d
        bits = np.stack([(np.arange(nc) >> i) & 1
                         for i in range(d - 1, -1, -1)], -1).astype(np.float32)
        for level in range(gcfg.num_levels):
            r = gcfg.resolutions[level]
            s = gcfg.level_sizes[level]
            pos = x01c * r
            pf = jnp.clip(jnp.floor(pos), 0, r - 1)
            frac = pos - pf
            w = jnp.prod(jnp.where(bits[None] > 0.5, frac[:, None, :],
                                   1.0 - frac[:, None, :]), axis=-1)
            idx = _cell_indices(gcfg, level, pf)           # (N,)
            # cotangent of sum() is ones: update rows = broadcast weights
            upd = jnp.tile(w[:, :, None],
                           (1, 1, gcfg.level_dim)).reshape(n, -1)  # (N, 64)
            order = jnp.argsort(idx)
            si = jnp.take(idx, order)
            su = jnp.take(upd, order, axis=0)
            c = jnp.cumsum(su, axis=0)
            nxt = jnp.concatenate([si[1:], jnp.full((1,), -1, si.dtype)])
            is_last = si != nxt
            # run sum = c[last] - c[prev last]; compute via c at last rows
            # gathered then differenced in compacted order
            last_pos = jnp.nonzero(is_last, size=n, fill_value=n - 1)[0]
            c_last = jnp.take(c, last_pos, axis=0)
            c_prev = jnp.concatenate(
                [jnp.zeros((1, c.shape[-1]), c.dtype), c_last[:-1]], axis=0)
            rows = c_last - c_prev
            uids = jnp.take(si, last_pos)
            # pads repeat the final id, so indices are sorted but NOT unique
            g = jnp.zeros((s, rows.shape[-1]), jnp.float32)
            g = g.at[uids].add(rows, indices_are_sorted=True)
            outs.append(g.sum())
        return sum(outs)

    f_gt_sort = jax.jit(table_grad_sort)

    # ---- shared per-level (idx, upd) builder for the manual variants
    def level_updates(x):
        x01c = jnp.clip((x + BOUND) / (2 * BOUND), 0.0, 1.0)
        d = gcfg.input_dim
        nc = 2 ** d
        bits = np.stack([(np.arange(nc) >> i) & 1
                         for i in range(d - 1, -1, -1)], -1).astype(np.float32)
        out = []
        for level in range(gcfg.num_levels):
            r = gcfg.resolutions[level]
            s = gcfg.level_sizes[level]
            pos = x01c * r
            pf = jnp.clip(jnp.floor(pos), 0, r - 1)
            frac = pos - pf
            w = jnp.prod(jnp.where(bits[None] > 0.5, frac[:, None, :],
                                   1.0 - frac[:, None, :]), axis=-1)
            idx = _cell_indices(gcfg, level, pf)
            upd = jnp.tile(w[:, :, None],
                           (1, 1, gcfg.level_dim)).reshape(n, -1)
            out.append((s, idx, upd))
        return out

    # ---- row-shard scatter: split each level table into S row shards and
    # scatter ALL n updates into each with OOB-drop (verdict item 4: the
    # 65k-row scatter microbenched 8.7x cheaper per row than 1M-row — is
    # f(table_size) steep enough to beat the Sx update re-processing?)
    def table_grad_shard(x, shards):
        outs = []
        for s, idx, upd in level_updates(x):
            if s <= 16384:   # small/dense levels: direct scatter already fast
                g = jnp.zeros((s, upd.shape[-1]), jnp.float32).at[idx].add(upd)
                outs.append(g.sum())
                continue
            rows_s = -(-s // shards)
            parts = []
            for sh in range(shards):
                # uint32 wrap puts out-of-shard rows far out of range ->
                # mode="drop" skips them
                local = idx - np.uint32(sh * rows_s)
                parts.append(
                    jnp.zeros((rows_s, upd.shape[-1]), jnp.float32)
                    .at[local].add(upd, mode="drop"))
            g = jnp.concatenate(parts)[:s]
            outs.append(g.sum())
        return sum(outs)

    f_gt_shard4 = jax.jit(lambda x: table_grad_shard(x, 4))
    f_gt_shard8 = jax.jit(lambda x: table_grad_shard(x, 8))
    f_gt_shard16 = jax.jit(lambda x: table_grad_shard(x, 16))

    # ---- consecutive-run pre-reduction: packed samples are ray-major and
    # depth-ordered, so consecutive samples often land in the SAME cell row
    # (~4-8 samples per fine cell at converged dt). Sum consecutive equal
    # indices via cumsum-diff (no sort), then scatter only run boundaries
    # (non-boundaries -> OOB drop). Collision count falls ~cell-sharing-fold.
    def table_grad_consec(x):
        outs = []
        for s, idx, upd in level_updates(x):
            c = jnp.cumsum(upd, axis=0)
            nxt = jnp.concatenate([idx[1:], jnp.full((1,), 2**31, idx.dtype)])
            is_last = idx != nxt
            last_pos = jnp.nonzero(is_last, size=n, fill_value=n - 1)[0]
            c_last = jnp.take(c, last_pos, axis=0)
            c_prev = jnp.concatenate(
                [jnp.zeros((1, upd.shape[-1]), c.dtype), c_last[:-1]], axis=0)
            seg = c_last - c_prev            # per-run sums; pad rows = 0
            uids = jnp.take(idx, last_pos)   # NOT globally sorted; dups ok
            g = jnp.zeros((s, upd.shape[-1]), jnp.float32).at[uids].add(seg)
            outs.append(g.sum())
        return sum(outs)

    f_gt_consec = jax.jit(table_grad_consec)

    # ---- one-hot matmul table grad (small dense levels; big levels xla)
    def table_grad_matmul(x):
        x01 = (x + BOUND) / (2 * BOUND)
        x01c = jnp.clip(x01, 0.0, 1.0)
        outs = []
        d = gcfg.input_dim
        nc = 2 ** d
        bits = np.stack([(np.arange(nc) >> i) & 1
                         for i in range(d - 1, -1, -1)], -1).astype(np.float32)
        for level in range(gcfg.num_levels):
            r = gcfg.resolutions[level]
            s = gcfg.level_sizes[level]
            pos = x01c * r
            pf = jnp.clip(jnp.floor(pos), 0, r - 1)
            frac = pos - pf
            w = jnp.prod(jnp.where(bits[None] > 0.5, frac[:, None, :],
                                   1.0 - frac[:, None, :]), axis=-1)
            idx = _cell_indices(gcfg, level, pf)
            upd = jnp.tile(w[:, :, None],
                           (1, 1, gcfg.level_dim)).reshape(n, -1)
            if s <= 8192:
                onehot = (idx[:, None] == jnp.arange(s)[None, :]).astype(
                    jnp.bfloat16)
                g = jax.lax.dot_general(
                    onehot, upd.astype(jnp.bfloat16),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                outs.append(g.sum())
            else:
                g = jnp.zeros((s, upd.shape[-1]), jnp.float32)
                g = g.at[idx].add(upd)
                outs.append(g.sum())
        return sum(outs)

    f_gt_matmul = jax.jit(table_grad_matmul)

    # ---- full loss grad anchor
    @jax.jit
    def f_full(x):
        def loss(p):
            out = net.density(p, x, cfg)
            return (out["sigma"] ** 2).mean()

        g = jax.grad(loss)(params)
        return sum(t.sum() for t in jax.tree_util.tree_leaves(g))

    def bench(fn, name):
        fn(pts_pool[-1]).block_until_ready()
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fn(pts_pool[i])
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:20s} {dt * 1e3:8.2f} ms", flush=True)

    bench(f_fwd, "fwd encode")
    bench(f_gx, "grad wrt x only")
    bench(f_gt_xla, "grad tables (xla)")
    bench(f_gt_bf16, "grad tables (bf16)")
    bench(f_gt_sort, "grad tables (sort)")
    bench(f_gt_shard4, "grad tables (shard4)")
    bench(f_gt_shard8, "grad tables (shard8)")
    bench(f_gt_shard16, "grad tables (shd16)")
    bench(f_gt_consec, "grad tables (consec)")
    bench(f_gt_matmul, "grad tables (matmul)")
    bench(f_full, "grad full density")


if __name__ == "__main__":
    main()
