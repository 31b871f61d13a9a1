"""Encoder factory.

Capability parity: reference encoding.py:45-77 (`get_encoder`) — maps a name
to an encoder and its output dim: None / frequency / sphere_harmonics /
hashgrid / tiledgrid. Functional flavor: returns (init_fn, encode_fn,
output_dim); encoders without parameters have init_fn = None.
"""

from functools import partial


from nerfnav_tpu.ops.frequency import freq_encode, freq_output_dim
from nerfnav_tpu.ops.hashgrid import HashGridConfig, hash_grid_encode, hash_grid_init
from nerfnav_tpu.ops.spherical_harmonics import sh_encode, sh_output_dim


def get_encoder(
    encoding: str,
    input_dim: int = 3,
    degree: int = 4,
    multires: int = 6,
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: int = 2048,
    layout: str = "corner",
    **kwargs,
):
    """Returns (init_fn | None, encode_fn, output_dim).

    encode_fn signature: (params_or_None, x) -> features.
    """
    if encoding in (None, "None", "none"):
        return None, (lambda p, x: x), input_dim

    if encoding == "frequency":
        return (
            None,
            lambda p, x: freq_encode(x, degree=multires),
            freq_output_dim(input_dim, multires),
        )

    if encoding in ("sphere_harmonics", "spherical_harmonics"):
        return None, (lambda p, x: sh_encode(x, degree=degree)), sh_output_dim(degree)

    if encoding in ("hashgrid", "tiledgrid"):
        cfg = HashGridConfig(
            input_dim=input_dim,
            num_levels=num_levels,
            level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            gridtype="tiled" if encoding == "tiledgrid" else "hash",
            layout=layout,
        )
        bound = kwargs.get("bound", 1.0)
        return (
            partial(hash_grid_init, config=cfg),
            lambda p, x: hash_grid_encode(p, x, cfg, bound=bound),
            cfg.output_dim,
        )

    raise ValueError(f"unknown encoding: {encoding}")
