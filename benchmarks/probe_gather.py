"""Gather-unit cost model probe: how much does index locality buy?

The render is gather-bound (hash encode ~4 rows/sample, march anchors);
round-1 microbenches said ~5 ns/row "regardless of width" and scatter cost
depends strongly on TABLE SIZE — implying an HBM-side caching effect. This
probe pins the gather cost as a function of:

  - table rows (2^12 .. 2^17) at the flagship 64-wide row
  - row dtype (fp32 vs bf16: does BYTE footprint matter, or row count?)
  - index locality: random | same-row runs of R (ray-major coarse-level
    pattern) | sequential blocks (tile-coherent pattern)

Each timed program consumes fresh indices (relay caches identical
executions). One process at a time; compilation cache on.
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
    ap.add_argument("--n", type=int, default=2 ** 21,
                    help="gathers per program (~a frame's encode rows)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    n = args.n
    rng = np.random.default_rng(0)

    def make_idx(rows, mode, run, seed):
        r = np.random.default_rng(seed)
        if mode == "random":
            return r.integers(0, rows, n, dtype=np.int32)
        if mode == "runs":  # same row repeated `run` times (coarse-level
            #                 pattern: consecutive samples share the cell)
            base = r.integers(0, rows, (n + run - 1) // run, dtype=np.int32)
            return np.repeat(base, run)[:n]
        if mode == "blocks":  # sequential rows within 64-row windows
            #                   (tile-coherent fine-level pattern)
            base = r.integers(0, max(rows - 64, 1),
                              (n + run - 1) // run, dtype=np.int32)
            off = np.tile(np.arange(run, dtype=np.int32), len(base))
            return (np.repeat(base, run) + off % 64)[:n]
        raise ValueError(mode)

    # The consumer must NOT be algebraically hoistable out of the gather:
    # sum(take(table, idx)) == histogram(idx) @ table, which XLA/the relay
    # can satisfy at index-read bandwidth (measured 0.01 ns/row — 100x
    # faster than any real gather). tanh(row + per-row offset) forces every
    # gathered row to be materialized and consumed individually.
    @jax.jit
    def g(table, idx):
        rows = jnp.take(table, idx, axis=0)
        shift = (idx % 7).astype(rows.dtype)[:, None]
        return jnp.tanh(rows + shift).sum()

    def bench(table, idx_pool):
        g(table, idx_pool[-1]).block_until_ready()
        t0 = time.perf_counter()
        out = None
        for i in range(args.iters):
            out = g(table, idx_pool[i])
        out.block_until_ready()
        return (time.perf_counter() - t0) / args.iters / n * 1e9  # ns/row

    for rows_log2 in (12, 14, 16, 17):
        rows = 2 ** rows_log2
        for dtype in (np.float32, None):  # None -> bf16
            if dtype is np.float32:
                table = jnp.asarray(
                    rng.normal(size=(rows, args.width)).astype(np.float32))
                dname = "f32"
            else:
                table = jnp.asarray(
                    rng.normal(size=(rows, args.width)).astype(np.float32)
                ).astype(jnp.bfloat16)
                dname = "bf16"
            for mode, run in (("random", 1), ("runs", 8), ("runs", 32),
                              ("blocks", 8)):
                pool = [jnp.asarray(make_idx(rows, mode, run, 1000 * i + rows))
                        for i in range(args.iters + 1)]
                ns = bench(table, pool)
                print(f"rows=2^{rows_log2} {dname} {mode}(r={run}):"
                      f" {ns:6.2f} ns/row", flush=True)


if __name__ == "__main__":
    main()
