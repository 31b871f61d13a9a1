"""NeRF field networks (sigma + color + optional background).

Capability parity: reference nerf/network.py:10-206 (`NeRFNetwork`) with the
hashgrid/SH backbone, nerf/network_ff.py (fused-MLP variant — on TPU the MXU
fuses these tiny matmuls under jit, with an optional Pallas fused-MLP kernel
as the perf variant), and the `get_encoder` factory (encoding.py:45-77).

Architecture (network.py:33-92):
  sigma net : hashgrid(32) -> [hidden 64] x (num_layers-1) -> 1 + geo_feat(15),
              density = trunc_exp(h[..., 0])
  color net : SH(16) + geo_feat(15) -> [hidden 64] x (num_layers_color-1) -> 3,
              sigmoid
  background: hashgrid2D(sph) + SH(dir) -> 2-layer MLP -> 3, sigmoid
              (only when bg_radius > 0)

TPU-native design: the model is a pure params-pytree + jittable functions (no
framework module state), so the same `density`/`forward` close over params and
jit/grad/vmap/shard_map freely — this is what lets the planner and pose filter
differentiate through the field in a single compiled step. Linear layers carry
no bias (reference network.py:38,62: bias=False).
"""

from dataclasses import dataclass
from functools import cached_property
import math

import jax
import jax.numpy as jnp

from nerfnav_tpu.ops.activation import trunc_exp
from nerfnav_tpu.ops.frequency import freq_encode, freq_output_dim
from nerfnav_tpu.ops.hashgrid import HashGridConfig, hash_grid_encode, hash_grid_init
from nerfnav_tpu.ops.spherical_harmonics import sh_encode, sh_output_dim


@dataclass(frozen=True)
class NetworkConfig:
    bound: float = 1.0
    # position encoder: "hashgrid" | "tiledgrid" | "frequency"
    encoding: str = "hashgrid"
    freq_degree: int = 10  # used when encoding == "frequency"
    # direction encoder: "sphere_harmonics" | "frequency"
    encoding_dir: str = "sphere_harmonics"
    sh_degree: int = 4
    freq_degree_dir: int = 4
    # sigma net (reference network.py:11-16 defaults)
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    # color net
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    # background (active when > 0), reference network.py:71-92
    bg_radius: float = -1.0
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    # density scale multiplies sigma in the renderer (reference renderer.py:61)
    density_scale: float = 1.0
    # compute dtype for the MLPs ("float32" or "bfloat16")
    mlp_dtype: str = "float32"
    # "xla": plain jnp matmul chain; "fused": Pallas fused-MLP kernel
    # (reference --ff backend, nerf/network_ff.py — VMEM-resident activations)
    mlp_backend: str = "xla"
    # hash grid schedule (reference grid.py:94-131 defaults)
    grid_levels: int = 16
    grid_level_dim: int = 2
    grid_base_resolution: int = 16
    grid_log2_hashmap_size: int = 19
    grid_max_resolution: int = 2048  # scaled by bound for desired_resolution
    grid_layout: str = "corner"      # "corner" (reference-exact) | "cell" (TPU-fast)
    # table-gradient strategy: "xla" scatter-add | "sort" segment-sum
    grid_backward: str = "xla"
    # lattice convention: "vertex" (native) | "ngp" (reference CUDA kernel —
    # required for checkpoints imported from torch-ngp, see
    # ops/hashgrid.HashGridConfig.coord_convention)
    grid_coord_convention: str = "vertex"
    # table compute dtype: "bfloat16" gathers/scatters table rows in bf16
    # while the fp32 masters feed the optimizer (HashGridConfig
    # .table_compute_dtype)
    grid_table_dtype: str = "float32"

    @cached_property
    def grid(self) -> HashGridConfig:
        return HashGridConfig(
            input_dim=3,
            num_levels=self.grid_levels,
            level_dim=self.grid_level_dim,
            base_resolution=self.grid_base_resolution,
            log2_hashmap_size=self.grid_log2_hashmap_size,
            desired_resolution=int(self.grid_max_resolution * self.bound),
            gridtype="tiled" if self.encoding == "tiledgrid" else "hash",
            layout=self.grid_layout,
            backward=self.grid_backward,
            coord_convention=self.grid_coord_convention,
            table_compute_dtype=self.grid_table_dtype,
        )

    @cached_property
    def bg_grid(self) -> HashGridConfig:
        # 2D hashgrid over spherical coords (reference network.py:74)
        return HashGridConfig(
            input_dim=2,
            num_levels=4,
            level_dim=2,
            base_resolution=16,
            log2_hashmap_size=19,
            desired_resolution=2048,
            coord_convention=self.grid_coord_convention,
        )

    @cached_property
    def pos_dim(self) -> int:
        if self.encoding in ("hashgrid", "tiledgrid"):
            return self.grid.output_dim
        return freq_output_dim(3, self.freq_degree)

    @cached_property
    def dir_dim(self) -> int:
        if self.encoding_dir == "sphere_harmonics":
            return sh_output_dim(self.sh_degree)
        return freq_output_dim(3, self.freq_degree_dir)

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.mlp_dtype == "bfloat16" else jnp.float32


def _linear_init(key, d_in, d_out, dtype=jnp.float32):
    """torch.nn.Linear default: U(-1/sqrt(d_in), 1/sqrt(d_in))."""
    lim = 1.0 / math.sqrt(d_in)
    return jax.random.uniform(key, (d_in, d_out), dtype=dtype, minval=-lim, maxval=lim)


def _mlp_init(key, dims):
    keys = jax.random.split(key, len(dims) - 1)
    return [_linear_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)]


def _mlp_apply(layers, x, dtype, final_activation=None, backend="xla"):
    """Bias-free MLP with ReLU hidden activations (reference network.py:95-122)."""
    if backend == "fused":
        from nerfnav_tpu.ops.fused_mlp import fused_mlp

        # interpret mode on CPU hosts (tests); compiled Mosaic on TPU
        interpret = jax.default_backend() == "cpu"
        h = fused_mlp(x.astype(jnp.float32), list(layers), "relu", "none", interpret)
        if final_activation is not None:
            h = final_activation(h)
        return h
    h = x.astype(dtype)
    for i, w in enumerate(layers):
        h = h @ w.astype(dtype)
        if i < len(layers) - 1:
            h = jax.nn.relu(h)
    h = h.astype(jnp.float32)
    if final_activation is not None:
        h = final_activation(h)
    return h


def init_network(key, cfg: NetworkConfig):
    """Build the params pytree."""
    k_grid, k_sigma, k_color, k_bg_grid, k_bg = jax.random.split(key, 5)
    params = {}
    if cfg.encoding in ("hashgrid", "tiledgrid"):
        params["encoder"] = hash_grid_init(k_grid, cfg.grid)
    sigma_dims = (
        [cfg.pos_dim]
        + [cfg.hidden_dim] * (cfg.num_layers - 1)
        + [1 + cfg.geo_feat_dim]
    )
    params["sigma_net"] = _mlp_init(k_sigma, sigma_dims)
    color_dims = (
        [cfg.dir_dim + cfg.geo_feat_dim]
        + [cfg.hidden_dim_color] * (cfg.num_layers_color - 1)
        + [3]
    )
    params["color_net"] = _mlp_init(k_color, color_dims)
    if cfg.bg_radius > 0:
        params["bg_encoder"] = hash_grid_init(k_bg_grid, cfg.bg_grid)
        bg_dims = (
            [cfg.bg_grid.output_dim + cfg.dir_dim]
            + [cfg.hidden_dim_bg] * (cfg.num_layers_bg - 1)
            + [3]
        )
        params["bg_net"] = _mlp_init(k_bg, bg_dims)
    return params


def _encode_pos(params, x, cfg: NetworkConfig):
    if cfg.encoding in ("hashgrid", "tiledgrid"):
        return hash_grid_encode(params["encoder"], x, cfg.grid, bound=cfg.bound)
    return freq_encode(x / cfg.bound, degree=cfg.freq_degree)


def _encode_dir(d, cfg: NetworkConfig):
    if cfg.encoding_dir == "sphere_harmonics":
        return sh_encode(d, degree=cfg.sh_degree)
    return freq_encode(d, degree=cfg.freq_degree_dir)


def density(params, x, cfg: NetworkConfig):
    """x: (N, 3) in [-bound, bound] -> {"sigma": (N,), "geo_feat": (N, geo)}.

    Parity: reference network.py:126-143 (`NeRFNetwork.density`).
    """
    h = _encode_pos(params, x, cfg)
    h = _mlp_apply(params["sigma_net"], h, cfg.compute_dtype, backend=cfg.mlp_backend)
    sigma = trunc_exp(h[..., 0])
    geo_feat = h[..., 1:]
    return {"sigma": sigma, "geo_feat": geo_feat}


def color(params, d, geo_feat, cfg: NetworkConfig):
    """View-dependent color head (reference network.py:112-122, 163-191).

    d: (N, 3) unit view directions; geo_feat: (N, geo). Returns rgb (N, 3).
    With static shapes there is no sparse `mask` fast path — callers composite
    with weights that already zero dead samples.
    """
    return color_from_encoded_dir(params, _encode_dir(d, cfg), geo_feat, cfg)


def color_from_encoded_dir(params, hd, geo_feat, cfg: NetworkConfig):
    """Color head on pre-encoded directions. A ray's direction is constant
    across its samples, so renderers encode it ONCE per ray and broadcast
    `hd` over the sample axis instead of re-running the SH recurrences per
    sample point (the reference evaluates SH per sample, shencoder kernel)."""
    h = jnp.concatenate([hd, geo_feat], axis=-1)
    return _mlp_apply(params["color_net"], h, cfg.compute_dtype, jax.nn.sigmoid, backend=cfg.mlp_backend)


def forward(params, x, d, cfg: NetworkConfig):
    """(sigma, rgb) for sample points — the innermost hot path (network.py:95-123)."""
    out = density(params, x, cfg)
    rgb = color(params, d, out["geo_feat"], cfg)
    return out["sigma"], rgb


def background(params, sph, d, cfg: NetworkConfig):
    """Background color from sphere coords + direction (network.py:145-160).

    sph: (N, 2) normalized spherical coords in [-1, 1]; d: (N, 3) directions.
    """
    h_sph = hash_grid_encode(params["bg_encoder"], sph, cfg.bg_grid, bound=1.0)
    hd = _encode_dir(d, cfg)
    h = jnp.concatenate([h_sph, hd], axis=-1)
    return _mlp_apply(params["bg_net"], h, cfg.compute_dtype, jax.nn.sigmoid, backend=cfg.mlp_backend)


def param_groups(params):
    """Split params for per-group learning rates (reference network.py:194-206:
    encoder at lr, nets at lr). Returns a label pytree for optax.multi_transform."""
    labels = {}
    for k in params:
        labels[k] = "encoder" if "encoder" in k else "net"
    return labels
