"""Export a nerfnav_tpu checkpoint to the reference torch-ngp .pth format.

The inverse of scripts/import_torch_ckpt.py: lets models trained (or
fine-tuned) here be loaded by the reference stack's Trainer
(nerf/utils.py:1000-1060) or any torch-ngp tooling.

Only checkpoints in the reference's representable architecture convert:
`grid_layout="corner"` with `grid_coord_convention="ngp"` (the CUDA kernel's
lattice). The TPU-flagship `cell` layout has no reference analogue — train
with `--grid_layout corner` + NetworkConfig(grid_coord_convention="ngp"),
or start from an imported checkpoint, if round-tripping matters.

Usage:
  python -m nerfnav_tpu.scripts.export_torch_ckpt ws/checkpoints/ngp_ep0100.npz \
      --out ngp_ep0100.pth --bound 2.0
"""

import argparse

import numpy as np


def export_params(params, grid_size: int = 128, density_grid=None):
    """Map our params pytree (+optional row-major density grid) to a
    reference state_dict of numpy arrays."""
    sd = {}
    tables = params["encoder"]
    offsets = np.zeros(len(tables) + 1, np.int32)
    for i, t in enumerate(tables):
        if np.asarray(t).shape[1] != np.asarray(tables[0]).shape[1]:
            raise ValueError("per-level feature dims differ — not a corner-"
                             "layout checkpoint (cell layout rows are "
                             "8*level_dim wide and cannot be exported)")
        offsets[i + 1] = offsets[i] + np.asarray(t).shape[0]
    sd["encoder.embeddings"] = np.concatenate(
        [np.asarray(t, np.float32) for t in tables], axis=0)
    sd["encoder.offsets"] = offsets
    for i, w in enumerate(params["sigma_net"]):
        sd[f"sigma_net.{i}.weight"] = np.asarray(w, np.float32).T
    for i, w in enumerate(params["color_net"]):
        sd[f"color_net.{i}.weight"] = np.asarray(w, np.float32).T
    if "bg_encoder" in params:
        bg = params["bg_encoder"]
        bg_off = np.zeros(len(bg) + 1, np.int32)
        for i, t in enumerate(bg):
            bg_off[i + 1] = bg_off[i] + np.asarray(t).shape[0]
        sd["encoder_bg.embeddings"] = np.concatenate(
            [np.asarray(t, np.float32) for t in bg], axis=0)
        sd["encoder_bg.offsets"] = bg_off
        for i, w in enumerate(params["bg_net"]):
            sd[f"bg_net.{i}.weight"] = np.asarray(w, np.float32).T
    if density_grid is not None:
        # ours is row-major (x*H + y)*H + z; the reference grid is
        # Morton-indexed (renderer.py update_extra_state)
        from nerfnav_tpu.ops.morton import rowmajor_to_morton

        dens = np.asarray(density_grid, np.float32)
        assert dens.shape[1] == grid_size**3
        out = np.zeros_like(dens)
        out[:, rowmajor_to_morton(grid_size)] = dens
        sd["density_grid"] = out
    return sd


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Convert a nerfnav_tpu npz checkpoint to torch-ngp .pth")
    ap.add_argument("ckpt", help="our checkpoint (.npz)")
    ap.add_argument("--out", required=True, help="output .pth path")
    ap.add_argument("--grid_size", type=int, default=128)
    args = ap.parse_args(argv)

    import json

    import torch

    data = np.load(args.ckpt if args.ckpt.endswith(".npz")
                   else args.ckpt + ".npz")
    info = json.loads(bytes(data["__meta__"].tobytes()).decode())
    meta = info.get("meta", {})
    grid_meta = meta.get("grid", {})
    # require the meta to RECORD the reference architecture: legacy
    # checkpoints without a coord_convention entry were trained on the
    # native vertex lattice and would render garbage in torch-ngp
    if (grid_meta.get("layout") != "corner"
            or grid_meta.get("coord_convention") != "ngp"):
        raise SystemExit(
            f"checkpoint grid meta {grid_meta} is not the torch-ngp "
            "representable architecture (needs recorded layout=corner + "
            "coord_convention=ngp — train with those flags or start from "
            "an imported checkpoint; see module doc)")

    # rebuild the params pytree from the path-keyed arrays (prefer EMA —
    # what the reference evaluates with)
    prefix = None
    for cand in ("['ema_params']", "['params']", ""):
        probe = [k for k in data.files
                 if k.startswith(f"k:{cand}['encoder']")]
        if probe:
            prefix = cand
            break
    if prefix is None:
        raise SystemExit("no encoder tables found in checkpoint")

    def collect(name):
        rows = []
        i = 0
        while f"k:{prefix}['{name}'][{i}]" in data.files:
            rows.append(data[f"k:{prefix}['{name}'][{i}]"])
            i += 1
        return rows

    params = {"encoder": collect("encoder"),
              "sigma_net": collect("sigma_net"),
              "color_net": collect("color_net")}
    bg = collect("bg_encoder")
    if bg:
        params["bg_encoder"] = bg
        params["bg_net"] = collect("bg_net")
    dens_key = "k:['occupancy']['density_grid']"
    density = data[dens_key] if dens_key in data.files else None

    sd = export_params(params, args.grid_size, density)
    state = {
        "model": {k: torch.from_numpy(v) for k, v in sd.items()},
        "epoch": meta.get("epoch", 0),
        "global_step": meta.get("global_step", 0),
        "stats": {"checkpoints": []},
    }
    torch.save(state, args.out)
    print(f"exported {args.ckpt} -> {args.out} "
          f"({len(sd)} tensors{', density grid' if density is not None else ''})")


if __name__ == "__main__":
    main()
