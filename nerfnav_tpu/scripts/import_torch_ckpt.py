"""Import a reference torch-ngp checkpoint (.pth) into this framework.

A user of the reference (stein7/nerf-navigation, i.e. torch-ngp + nav) can
bring a TRAINED model across: this converts the reference Trainer checkpoint
(nerf/utils.py:938-998 — {'model': state_dict, 'mean_density', ...}) into our
npz format (training/checkpoint.py), mapping

  encoder.embeddings + encoder.offsets  -> params["encoder"] per-level tables
  sigma_net.{i}.weight (out,in)         -> params["sigma_net"] (in,out) list
  color_net.{i}.weight                  -> params["color_net"]
  encoder_bg.* / bg_net.* (if present)  -> params["bg_encoder"/"bg_net"]
  density_grid [CAS, H^3] (Morton)      -> occupancy state (row-major) with
                                           rebuilt bitfields/blocks

The imported model must be evaluated with the reference's lattice convention
(grid_coord_convention="ngp", ops/hashgrid.py: pos = x*scale+0.5, fractional
per-level scale, d-ascending dense strides — bit-matching gridencoder.cu).
The checkpoint meta records layout=corner + coord_convention=ngp, so the
loader enforces matching flags (--grid_layout corner plus
NetworkConfig(grid_coord_convention="ngp")).

Usage:
  python -m nerfnav_tpu.scripts.import_torch_ckpt ref_ckpt.pth \
      --out workspace/checkpoints/ngp_ep0001.npz --bound 2.0
"""

import argparse
import math

import numpy as np


def _state_dict(ckpt):
    if isinstance(ckpt, dict) and "model" in ckpt:
        return ckpt["model"], ckpt
    return ckpt, {}


def import_state_dict(sd, bound: float, base_resolution: int = 16,
                      log2_hashmap_size: int | None = None,
                      grid_size: int = 128, density_thresh: float = 10.0,
                      mean_density: float | None = None,
                      desired_resolution: int | None = None):
    """Map a reference NeRFNetwork state_dict (numpy-valued) to
    (params, NetworkConfig, occupancy_state_or_None).

    sd: dict of numpy arrays keyed like the torch state_dict.
    """
    from nerfnav_tpu.models.network import NetworkConfig
    from nerfnav_tpu.ops.hashgrid import HashGridConfig

    emb = np.asarray(sd["encoder.embeddings"], np.float32)
    offsets = np.asarray(sd["encoder.offsets"], np.int64)
    num_levels = len(offsets) - 1
    level_dim = emb.shape[1]
    sizes = np.diff(offsets)
    if log2_hashmap_size is None:
        # capped levels sit exactly at 2^log2 rows; uncapped grids need the
        # flag (cannot be inferred from sizes alone)
        top = int(sizes.max())
        log2_hashmap_size = int(round(math.log2(top)))
        if 2**log2_hashmap_size != top:
            raise ValueError(
                f"cannot infer log2_hashmap_size from level sizes {sizes}; "
                "pass --log2_hashmap_size explicitly")

    sigma_ws, color_ws, bg_ws = [], [], []
    for i in range(64):
        k = f"sigma_net.{i}.weight"
        if k not in sd:
            break
        sigma_ws.append(np.asarray(sd[k], np.float32).T)  # (in, out)
    for i in range(64):
        k = f"color_net.{i}.weight"
        if k not in sd:
            break
        color_ws.append(np.asarray(sd[k], np.float32).T)
    for i in range(64):
        k = f"bg_net.{i}.weight"
        if k not in sd:
            break
        bg_ws.append(np.asarray(sd[k], np.float32).T)
    if not sigma_ws or not color_ws:
        raise ValueError("state_dict has no sigma_net/color_net weights — "
                         "is this a reference NeRFNetwork checkpoint?")

    geo_feat_dim = sigma_ws[-1].shape[1] - 1
    if desired_resolution is None:
        # reference network.py:31: get_encoder(desired_resolution=2048*bound)
        desired_resolution = int(2048 * bound)
    cfg = NetworkConfig(
        bound=bound,
        grid_levels=num_levels,
        grid_level_dim=level_dim,
        grid_base_resolution=base_resolution,
        # NetworkConfig scales grid_max_resolution by bound internally
        grid_max_resolution=int(round(desired_resolution / bound)),
        grid_log2_hashmap_size=log2_hashmap_size,
        grid_layout="corner",
        grid_coord_convention="ngp",
        num_layers=len(sigma_ws),
        hidden_dim=sigma_ws[0].shape[1],
        geo_feat_dim=geo_feat_dim,
        num_layers_color=len(color_ws),
        hidden_dim_color=color_ws[0].shape[1],
        bg_radius=1.0 if bg_ws else -1.0,
        num_layers_bg=max(len(bg_ws), 2),
        hidden_dim_bg=bg_ws[0].shape[1] if bg_ws else 64,
    )

    # slice the flat embedding tensor into our per-level tables; the level
    # schedule must agree or the tables mean nothing
    ours = cfg.grid.level_sizes
    if tuple(int(s) for s in sizes) != tuple(ours):
        raise ValueError(
            f"level-size schedule mismatch: checkpoint {list(sizes)} vs "
            f"config {list(ours)} — check --bound / --base_resolution / "
            "--log2_hashmap_size against the reference training flags")
    params = {
        "encoder": [emb[offsets[l]:offsets[l + 1]] for l in range(num_levels)],
        "sigma_net": sigma_ws,
        "color_net": color_ws,
    }
    if bg_ws:
        bg_emb = np.asarray(sd["encoder_bg.embeddings"], np.float32)
        bg_off = np.asarray(sd["encoder_bg.offsets"], np.int64)
        bg_sizes = tuple(int(s) for s in np.diff(bg_off))
        if bg_sizes != tuple(cfg.bg_grid.level_sizes):
            raise ValueError(
                f"bg grid schedule mismatch: {bg_sizes} vs "
                f"{cfg.bg_grid.level_sizes}")
        params["bg_encoder"] = [
            bg_emb[bg_off[l]:bg_off[l + 1]] for l in range(len(bg_off) - 1)
        ]
        params["bg_net"] = bg_ws

    occupancy = None
    if "density_grid" in sd:
        occupancy = _import_density_grid(
            np.asarray(sd["density_grid"], np.float32), bound, grid_size,
            density_thresh, mean_density)
    return params, cfg, occupancy


def _import_density_grid(dens_morton, bound, grid_size, density_thresh,
                         mean_density):
    """Reference density_grid [CAS, H^3] is indexed by MORTON code
    (renderer.py update_extra_state writes at raymarching.morton3D(coords));
    ours is row-major (x*H + y)*H + z. Decode + rebuild bitfields/blocks."""
    import jax
    import jax.numpy as jnp

    from nerfnav_tpu.models.occupancy import (
        OccupancyConfig, _finish_update, init_occupancy_state,
    )
    from nerfnav_tpu.ops.morton import rowmajor_to_morton

    cas, n = dens_morton.shape
    h = grid_size
    assert n == h**3, f"density_grid has {n} cells, expected {h**3}"
    cfg = OccupancyConfig(bound=bound, grid_size=grid_size,
                          density_thresh=density_thresh)
    if cfg.cascades != cas:
        raise ValueError(
            f"checkpoint has {cas} density cascades but bound={bound} "
            f"implies {cfg.cascades} — pass the reference's --bound")
    dens = dens_morton[:, rowmajor_to_morton(h)]  # row-major layout

    state = init_occupancy_state(cfg)
    grid = jnp.asarray(dens)
    state = _finish_update(state, cfg, grid, grid, None)
    if mean_density is not None:
        state["mean_density"] = jnp.asarray(mean_density, jnp.float32)
    return jax.tree_util.tree_map(np.asarray, state)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Convert a reference torch-ngp .pth checkpoint to npz")
    ap.add_argument("ckpt", help="reference checkpoint (.pth)")
    ap.add_argument("--out", required=True,
                    help="output npz path (e.g. ws/checkpoints/ngp_ep0001.npz)")
    ap.add_argument("--bound", type=float, required=True,
                    help="the --bound the reference model was trained with "
                         "(sets the level schedule via desired_resolution)")
    ap.add_argument("--base_resolution", type=int, default=16)
    ap.add_argument("--desired_resolution", type=int, default=None,
                    help="finest-level resolution (reference default "
                         "2048 * bound, network.py:31)")
    ap.add_argument("--log2_hashmap_size", type=int, default=None)
    ap.add_argument("--grid_size", type=int, default=128)
    ap.add_argument("--density_thresh", type=float, default=10.0)
    args = ap.parse_args(argv)

    import torch

    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd_t, extras = _state_dict(ckpt)
    sd = {k: v.detach().cpu().numpy() for k, v in sd_t.items()
          if hasattr(v, "detach")}
    params, cfg, occupancy = import_state_dict(
        sd, args.bound, args.base_resolution, args.log2_hashmap_size,
        args.grid_size, args.density_thresh,
        mean_density=extras.get("mean_density"),
        desired_resolution=args.desired_resolution)

    from nerfnav_tpu.training import checkpoint as ckpt_lib

    tree = {"params": params, "ema_params": params}
    if occupancy is not None:
        tree["occupancy"] = occupancy
    meta = {
        "epoch": int(extras.get("epoch", 0)),
        "global_step": int(extras.get("global_step", 0)),
        "grid": {
            "levels": cfg.grid_levels,
            "level_dim": cfg.grid_level_dim,
            "log2_hashmap_size": cfg.grid_log2_hashmap_size,
            "layout": "corner",
            "coord_convention": "ngp",
            "max_resolution": cfg.grid_max_resolution,
        },
        "imported_from": "torch-ngp",
    }
    ckpt_lib.save_checkpoint(args.out, tree, meta)
    print(f"imported {args.ckpt} -> {args.out}")
    print(f"  grid: corner {cfg.grid_levels}x{cfg.grid_level_dim} "
          f"@2^{cfg.grid_log2_hashmap_size} (ngp convention)")
    print(f"  occupancy: {'yes' if occupancy is not None else 'no'}")
    print("Evaluate with: NetworkConfig(grid_layout='corner', "
          "grid_coord_convention='ngp', ...) or the matching --grid_* flags.")


if __name__ == "__main__":
    main()
