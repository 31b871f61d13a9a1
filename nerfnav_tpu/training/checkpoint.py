"""Checkpoint save/load with the reference's rolling/full/best semantics.

Capability parity: reference nerf/utils.py:938-1060 —
  * full checkpoints: {epoch, global_step, stats, model, optimizer, ema}
  * rolling window max_keep (969-972, default 2)
  * "best" keeps model params only, occupancy grid stripped (987-996)
  * resume from latest | best | scratch | explicit path (361-379, 1000-1060)
    with loose loading (missing/unexpected key reporting, 1017-1022)

Format: a single .npz per checkpoint (flattened pytree leaves as numpy
arrays) + embedded JSON treedef/stats — dependency-free and stable across JAX
versions (orbax's evolving layout is avoided deliberately; the on-disk
contract here is ours).
"""

import glob
import json
import os

import jax
import numpy as np


def save_checkpoint(path: str, tree, meta: dict | None = None):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    # Path-keyed leaves: loading with a PARTIAL template (e.g. just
    # ema_params, or ema_params + occupancy for the nav stack) picks the
    # right arrays by name instead of positional index — positional matching
    # silently misassigns same-shaped leaves when template and file trees
    # differ (reference's torch load_state_dict is name-keyed for the same
    # reason, utils.py:1017-1022).
    arrays = {f"k:{jax.tree_util.keystr(kp)}": np.asarray(x) for kp, x in leaves}
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"treedef": str(treedef), "meta": meta or {}}).encode(),
        dtype=np.uint8,
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)


def load_checkpoint(path: str, like):
    """Load into the structure of `like` (loose: missing/shape-mismatched
    leaves keep the template value and are reported). Returns
    (tree, meta, report). Reads both the path-keyed format and the legacy
    positional `leaf_i` format."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    info = json.loads(bytes(data["__meta__"].tobytes()).decode())
    keyed = any(k.startswith("k:") for k in data.files)
    report = []
    leaves = []
    flat = jax.tree_util.tree_flatten_with_path(like)[0]
    treedef = jax.tree_util.tree_structure(like)
    for i, (kp, tmpl) in enumerate(flat):
        k = f"k:{jax.tree_util.keystr(kp)}" if keyed else f"leaf_{i}"
        if k in data and data[k].shape == np.shape(tmpl):
            leaves.append(jax.numpy.asarray(data[k]))
        else:
            report.append(f"{k}: missing or shape mismatch, kept template")
            leaves.append(tmpl)
    return jax.tree_util.tree_unflatten(treedef, leaves), info["meta"], report


def grid_meta_of(cfg) -> dict:
    """Grid-architecture fingerprint recorded in checkpoint meta and checked
    at load (a checkpoint trained under different --grid_* flags must fail
    loudly, not keep random template params)."""
    return {
        "levels": cfg.grid_levels,
        "level_dim": cfg.grid_level_dim,
        "log2_hashmap_size": cfg.grid_log2_hashmap_size,
        "layout": cfg.grid_layout,
        "coord_convention": cfg.grid_coord_convention,
        "max_resolution": cfg.grid_max_resolution,
    }


def check_grid_meta(meta: dict, cfg, path: str):
    """Raise when the checkpoint's recorded grid architecture disagrees with
    the resolved config. Compares only keys the file recorded — older
    checkpoints predate some fields (e.g. coord_convention) and keep
    loading."""
    saved = (meta or {}).get("grid")
    current = grid_meta_of(cfg)
    if saved and any(v != saved[k] for k, v in current.items() if k in saved):
        raise ValueError(
            f"checkpoint {path} was trained with grid architecture "
            f"{saved}, but the resolved config is {current} — loading "
            "would keep random template params and render garbage. Pass "
            "matching --grid_* flags (incl. --grid_coord_convention ngp "
            "for torch-ngp imports) or the same -O setting used at "
            "training time."
        )


def prune_checkpoints(ckpt_dir: str, name: str, max_keep: int = 2):
    """Rolling window: delete oldest ngp_ep*.npz beyond max_keep."""
    files = sorted(glob.glob(os.path.join(ckpt_dir, f"{name}_ep*.npz")))
    for f in files[:-max_keep]:
        os.remove(f)


def latest_checkpoint(ckpt_dir: str, name: str):
    files = sorted(glob.glob(os.path.join(ckpt_dir, f"{name}_ep*.npz")))
    return files[-1] if files else None
