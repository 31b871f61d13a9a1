from nerfnav_tpu.ops.activation import trunc_exp
from nerfnav_tpu.ops.frequency import freq_encode, freq_output_dim
from nerfnav_tpu.ops.spherical_harmonics import sh_encode, sh_output_dim
from nerfnav_tpu.ops.hashgrid import (
    HashGridConfig,
    hash_grid_init,
    hash_grid_encode,
)
from nerfnav_tpu.ops.losses import mape_loss, huber_loss, eff_distloss

__all__ = [
    "trunc_exp",
    "freq_encode",
    "freq_output_dim",
    "sh_encode",
    "sh_output_dim",
    "HashGridConfig",
    "hash_grid_init",
    "hash_grid_encode",
    "mape_loss",
    "huber_loss",
    "eff_distloss",
]
