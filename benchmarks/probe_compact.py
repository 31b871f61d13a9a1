"""Compaction-algorithm shootout: (N, T) occupancy -> first-K indices.

The marcher's _compact_idx computes idx_j = count(cs < j) with a T x K
compare-count — O(T*K) VPU work per ray, now the largest march component at
the seg16 flagship (probe_phase_a: +39 ms for T=114/K=16; phase B is
T=128/K=32). Candidates:

  rank-compare      current: (cs[:,:,None] < targets).sum(1)
  rank-unrolled     same math, K-loop of (N,T) reductions (fusion shape)
  rank-matmul       indicator summed via bf16 dot with ones (MXU offload)
  scatter-slot      O(T): each occupied candidate computes its slot cs-1
                    and a unique-index scatter-min writes its position

All variants share the stride pre-thinning, so outputs are identical;
each stage checks correctness once on the first chunk.
"""
import argparse
import time

import numpy as np

from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--t", type=int, default=128)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--n_chunks", type=int, default=79)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--occ_frac", type=float, default=0.25)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    n, t, k = args.n, args.t, args.k
    rng = np.random.default_rng(0)
    occs = jnp.asarray(
        rng.uniform(size=(args.n_chunks, n, t)) < args.occ_frac)

    targets = jnp.arange(1, k + 1, dtype=jnp.int32)

    def pre(occ):
        """Shared stride thinning (identical to _compact_idx spread)."""
        cs = jnp.cumsum(occ.astype(jnp.int32), axis=1)
        cnt = cs[:, -1:]
        stride = jnp.maximum((cnt + k - 1) // k, 1)
        occ = occ & ((cs - 1) % stride == 0)
        cs = jnp.cumsum(occ.astype(jnp.int32), axis=1)
        return occ, cs

    # inclusive prefix: out_i = sum_j x_j * tri[j, i] needs tri[j, i] = [j <= i]
    tri = jnp.asarray(np.triu(np.ones((t, t), np.float32))).astype(jnp.bfloat16)

    def cumsum_mm(x_bool):
        # prefix sum over the minor axis as a triangular matmul (MXU):
        # values <= t = 128 are exact in bf16's 8-bit mantissa
        return jax.lax.dot_general(
            x_bool.astype(jnp.bfloat16), tri,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)

    @jax.jit
    def s_pre_only(occ):
        occ, cs = pre(occ)
        return cs.sum(), occ.sum()

    @jax.jit
    def s_cumsum_native(occ):
        return jnp.cumsum(occ.astype(jnp.int32), axis=1).sum()

    @jax.jit
    def s_cumsum_matmul(occ):
        return cumsum_mm(occ).sum()

    def pre_mm(occ):
        cs = cumsum_mm(occ)
        cnt = cs[:, -1:]
        stride = jnp.maximum((cnt + k - 1) // k, 1)
        occ = occ & ((cs - 1) % stride == 0)
        cs = cumsum_mm(occ)
        return occ, cs

    @jax.jit
    def rank_compare_mm(occ):
        occ, cs = pre_mm(occ)
        idx = jnp.sum(
            (cs[:, :, None] < targets[None, None, :]).astype(jnp.int32),
            axis=1)
        valid = targets[None, :] <= cs[:, -1:]
        return jnp.minimum(idx, t - 1), valid

    @jax.jit
    def rank_full_mm(occ):
        # matmul cumsums AND a matmul rank stage: idx_j = sum_t [cs_t < j]
        # = sum_t [cs_t <= j-1]; the indicator contraction over T rides the
        # MXU too via one-hot-free trick: count of cs values < j equals
        # sum over classes c<j of hist_c; hist via one-hot matmul
        occ, cs = pre_mm(occ)
        # the j-th kept index is the unique OCCUPIED position with cs == j:
        # a gated one-hot over ranks contracted with the position vector
        oh = (cs[:, :, None] == jnp.arange(1, k + 1)[None, None, :])
        ohf = (oh & occ[:, :, None]).astype(jnp.bfloat16)   # (N, T, K)
        pos_w = jnp.asarray(np.arange(t), np.float32).astype(jnp.bfloat16)
        idx = jax.lax.dot_general(
            ohf, pos_w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        valid = targets[None, :] <= cs[:, -1:]
        # empty slots contract to 0; clamp like the reference impl
        return jnp.minimum(idx, t - 1), valid

    @jax.jit
    def rank_compare(occ):
        occ, cs = pre(occ)
        idx = jnp.sum(
            (cs[:, :, None] < targets[None, None, :]).astype(jnp.int32),
            axis=1)
        valid = targets[None, :] <= cs[:, -1:]
        return jnp.minimum(idx, t - 1), valid

    @jax.jit
    def rank_transposed(occ):
        # indicator laid out (N, K, T): minor axis = T (full 128 lanes),
        # reduction over minor — no lane padding on the intermediate
        occ, cs = pre(occ)
        ind = (cs[:, None, :] < targets[None, :, None]).astype(jnp.int32)
        idx = jnp.sum(ind, axis=-1)
        valid = targets[None, :] <= cs[:, -1:]
        return jnp.minimum(idx, t - 1), valid

    @jax.jit
    def rank_transposed_bf16(occ):
        occ, cs = pre(occ)
        ind = (cs[:, None, :] < targets[None, :, None]).astype(jnp.bfloat16)
        idx = jnp.sum(ind, axis=-1).astype(jnp.int32)
        valid = targets[None, :] <= cs[:, -1:]
        return jnp.minimum(idx, t - 1), valid

    @jax.jit
    def log_shift(occ):
        # SIMD stream compaction: element at p must move left by
        # h(p) = p - (cs[p]-1) = holes before it; shift by powers of two.
        occ, cs = pre(occ)
        nn = occ.shape[0]
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], occ.shape)
        val = jnp.where(occ, pos, t - 1)
        shift = jnp.where(occ, pos - (cs - 1), 0)
        b = 1
        while b < t:
            moved_val = jnp.concatenate(
                [val[:, b:], jnp.full((nn, b), t - 1, val.dtype)], axis=1)
            moved_shift = jnp.concatenate(
                [shift[:, b:], jnp.zeros((nn, b), shift.dtype)], axis=1)
            take = (moved_shift & b) > 0
            val = jnp.where(take, moved_val, val)
            shift = jnp.where(take, moved_shift - b, shift)
            b <<= 1
        idx = val[:, :k]
        valid = targets[None, :] <= cs[:, -1:]
        return jnp.minimum(idx, t - 1), valid

    @jax.jit
    def rank_matmul(occ):
        occ, cs = pre(occ)
        ind = (cs[:, :, None] < targets[None, None, :]).astype(jnp.bfloat16)
        idx = jnp.einsum("ntk,t->nk", ind, jnp.ones((t,), jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        idx = idx.astype(jnp.int32)
        valid = targets[None, :] <= cs[:, -1:]
        return jnp.minimum(idx, t - 1), valid

    @jax.jit
    def scatter_slot(occ):
        occ, cs = pre(occ)
        d = cs - 1
        keep = occ & (d < k)
        dd = jnp.where(keep, d, k)                       # k = trash column
        pos = jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.int32)[None], occ.shape)
        buf = jnp.full((occ.shape[0], k + 1), t - 1, jnp.int32)
        rows = jnp.broadcast_to(
            jnp.arange(occ.shape[0], dtype=jnp.int32)[:, None], occ.shape)
        idx = buf.at[rows, dd].min(pos, unique_indices=True)[:, :k]
        valid = targets[None, :] <= cs[:, -1:]
        return idx, valid

    fns = {
        "rank-compare": rank_compare,
        "rank-compare-mmcs": rank_compare_mm,
        "rank-full-mm": rank_full_mm,
    }
    stages = {
        "pre-only": s_pre_only,
        "cumsum-native": s_cumsum_native,
        "cumsum-matmul": s_cumsum_matmul,
    }
    for name, fn in stages.items():
        fn(occs[0])
        t0 = time.perf_counter()
        for it in range(args.iters):
            outs = [fn(occs[(c + it) % args.n_chunks])
                    for c in range(args.n_chunks)]
            jax.block_until_ready(outs[-1])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:16s} {dt * 1e3:8.1f} ms/frame", flush=True)
    ref_i, ref_v = None, None
    for name, fn in fns.items():
        i0, v0 = fn(occs[0])
        if ref_i is None:
            ref_i, ref_v = np.asarray(i0), np.asarray(v0)
        else:
            vi = np.asarray(v0)
            assert np.array_equal(vi, ref_v), name
            assert np.array_equal(np.asarray(i0)[ref_v], ref_i[ref_v]), name
        t0 = time.perf_counter()
        for it in range(args.iters):
            outs = [fn(occs[(c + it) % args.n_chunks])
                    for c in range(args.n_chunks)]
            jax.block_until_ready(outs[-1])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:16s} {dt * 1e3:8.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
