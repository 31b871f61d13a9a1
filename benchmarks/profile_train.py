"""Stage breakdown of the grid-path TRAIN step on the real chip.

Times each stage as its own jitted program on identical data: march,
forward-only loss, value_and_grad, and the full train step (sampling +
render + loss + Adam + EMA + error map). Stage sums exceed the full step
(XLA overlaps inside one program); the RATIOS say what to attack.

Run: python benchmarks/profile_train.py [--levels 16 --level_dim 2]
"""

import argparse
import json
import time

import numpy as np

from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def timed(fn, iters=20):
    """fn(key) -> output. A fresh key per call — the relay caches identical
    executions, so timing the same input twice measures nothing."""
    import jax

    keys = jax.random.split(jax.random.PRNGKey(7), iters + 1)
    out = fn(keys[0])
    jax_block(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(keys[i + 1])
    jax_block(out)
    return (time.perf_counter() - t0) / iters


def jax_block(x):
    import jax

    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a,
        x,
    )


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from nerfnav_tpu.models import (
        NetworkConfig, init_network, make_field, render_rays_grid,
    )
    from nerfnav_tpu.models.occupancy import OccupancyConfig, init_occupancy_state
    from nerfnav_tpu.ops.marching import MarchConfig, march

    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, default=16)
    ap.add_argument("--level_dim", type=int, default=2)
    ap.add_argument("--log2", type=int, default=16)
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--budget", type=int, default=None,
                    help="packed-shade sample budget (render_rays_grid)")
    args = ap.parse_args()

    cfg = NetworkConfig(bound=1.0, mlp_dtype="bfloat16", grid_layout="cell",
                        grid_log2_hashmap_size=args.log2,
                        grid_levels=args.levels, grid_level_dim=args.level_dim)
    mcfg = MarchConfig(bound=1.0, samples_per_ray=32, coarse_normalized=False)
    ocfg = OccupancyConfig(bound=1.0)
    params = init_network(jax.random.PRNGKey(0), cfg)

    # converged-ish occupancy shell
    from nerfnav_tpu.ops.morton import pack_blocks, packbits

    Hg = mcfg.grid_size
    ii = np.arange(Hg**3)
    c = (np.stack([ii // (Hg * Hg), (ii // Hg) % Hg, ii % Hg], -1) + 0.5) / Hg * 2 - 1
    occ = (np.linalg.norm(c, axis=-1) < 0.6)[None]
    hc = Hg // mcfg.coarse_factor
    f = mcfg.coarse_factor
    occ_c = occ.reshape(1, hc, f, hc, f, hc, f).max(axis=(2, 4, 6)).reshape(1, -1)
    occupancy = {
        "bitfield": packbits(jnp.asarray(occ.astype(np.float32))),
        "blocks": pack_blocks(jnp.asarray(occ), Hg),
        "blocks_coarse": pack_blocks(jnp.asarray(occ_c), hc,
                                     block=8 if hc % 8 == 0 else 4),
    }

    rng = np.random.default_rng(0)
    n = args.rays
    ro = jnp.asarray(np.concatenate([rng.uniform(-0.9, 0.9, (n, 2)),
                                     np.full((n, 1), -1.6)], -1), jnp.float32)
    d = rng.normal(size=(n, 3))
    d[:, 2] = np.abs(d[:, 2]) + 0.5
    rd = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    gt = jnp.asarray(rng.random((n, 3)), jnp.float32)

    opt = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = opt.init(params)

    march_fn = jax.jit(lambda key: march(ro, rd, occupancy, mcfg, key=key)["z"])

    def loss_of(p, key):
        field = make_field(p, cfg)
        out = render_rays_grid(field, occupancy, mcfg, ro, rd, key=key,
                               bg_color=1.0, sample_budget=args.budget)
        return jnp.mean((out["image"] - gt) ** 2)

    fwd_fn = jax.jit(loss_of)
    grad_fn = jax.jit(lambda p, key: jax.value_and_grad(loss_of)(p, key)[1])

    @jax.jit
    def full_step(p, s, key):
        loss, g = jax.value_and_grad(loss_of)(p, key)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, loss

    res = {}
    m = march(ro, rd, occupancy, mcfg, key=jax.random.PRNGKey(3))
    res["valid_frac"] = float(jnp.mean(m["valid"].astype(jnp.float32)))
    res["march_ms"] = timed(march_fn) * 1e3
    res["fwd_ms"] = timed(lambda k: fwd_fn(params, k)) * 1e3
    res["grad_ms"] = timed(lambda k: grad_fn(params, k)) * 1e3
    res["full_step_ms"] = timed(lambda k: full_step(params, opt_state, k)) * 1e3
    res = {k: round(v, 2) for k, v in res.items()}
    res.update(levels=args.levels, level_dim=args.level_dim,
               log2=args.log2, rays=n)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
