"""Decompose the shading cost: hash-table gathers vs interp vs MLP.

Stages (fixed 4096-pt chunks x 157, flagship field config):
  gather f32x64        one take/pt into a (2^17, 64) f32 table
  gather bf16x64       same rows at bf16 (128B rows: does row size matter?)
  gather f32x32        narrower f32 rows
  gather local         f32x64 with spatially-coherent (sorted) indices
  encode               full 4-level hash_grid_encode (gathers + interp)
  encode+sigma         + density MLP (bf16 MXU)
  full shade           + SH dir encode + color MLP

Inputs roll across iterations (relay execution cache defeat).
"""
import argparse
import time

import numpy as np

from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def main():
    import jax
    import jax.numpy as jnp

    from nerfnav_tpu.models import NetworkConfig, init_network, make_field
    from nerfnav_tpu.models import network as net

    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--n_chunks", type=int, default=157)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    BOUND = 2.0
    cfg = NetworkConfig(bound=BOUND, mlp_dtype="bfloat16", grid_layout="cell",
                        grid_log2_hashmap_size=17, grid_levels=4,
                        grid_level_dim=8)
    params = init_network(jax.random.PRNGKey(0), cfg)
    field = make_field(params, cfg)

    rows = 2 ** 17
    key = jax.random.PRNGKey(1)
    tbl_f32 = jax.random.normal(key, (rows, 64), jnp.float32)
    tbl_bf16 = tbl_f32.astype(jnp.bfloat16)
    tbl_f32n = tbl_f32[:, :32]

    n = args.chunk * args.k  # points per chunk program
    nch = args.n_chunks
    rng = np.random.default_rng(0)
    idx_rand = jnp.asarray(rng.integers(0, rows, (nch, n)), jnp.int32)
    idx_local = jnp.sort(idx_rand, axis=-1)
    # shell-ish positions for the real encode (in-bounds)
    pts = rng.uniform(-1.0, 1.0, (nch, n, 3)).astype(np.float32)
    r = np.linalg.norm(pts, axis=-1, keepdims=True) + 1e-6
    pts = pts / r * rng.uniform(0.35, 0.5, (nch, n, 1)).astype(np.float32)
    pts = jnp.asarray(pts)
    dirs = jnp.asarray(
        rng.normal(size=(nch, args.chunk, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    @jax.jit
    def g_f32(i):
        return jnp.take(tbl_f32, i, axis=0).sum()

    @jax.jit
    def g_bf16(i):
        return jnp.take(tbl_bf16, i, axis=0).astype(jnp.float32).sum()

    @jax.jit
    def g_f32n(i):
        return jnp.take(tbl_f32n, i, axis=0).sum()

    @jax.jit
    def enc(p):
        return net._encode_pos(params, p, cfg).astype(jnp.float32).sum()

    @jax.jit
    def enc_sigma(p):
        sigma, geo = field.density_fn(p)
        return sigma.sum() + geo.astype(jnp.float32).sum()

    @jax.jit
    def shade(p, d):
        kk = p.shape[0] // d.shape[0]
        dd = jnp.repeat(d, kk, axis=0)
        sigma, geo = field.density_fn(p)
        rgb = field.color_fn(dd, geo)
        return sigma.sum() + rgb.sum()

    def bench(fn, name, *arrs):
        fn(*[a[0] for a in arrs]).block_until_ready()
        t0 = time.perf_counter()
        for it in range(args.iters):
            outs = [fn(*[a[(i + it) % nch] for a in arrs])
                    for i in range(nch)]
            jax.block_until_ready(outs[-1])
        dt = (time.perf_counter() - t0) / args.iters
        per = dt / (nch * n)
        print(f"{name:18s} {dt * 1e3:8.1f} ms/frame   {per * 1e9:6.2f} ns/pt",
              flush=True)

    bench(g_f32, "gather f32x64", idx_rand)
    bench(g_bf16, "gather bf16x64", idx_rand)
    bench(g_f32n, "gather f32x32", idx_rand)
    bench(g_f32, "gather local", idx_local)
    bench(enc, "encode", pts)
    bench(enc_sigma, "encode+sigma", pts)
    bench(shade, "full shade", pts, dirs)


if __name__ == "__main__":
    main()
