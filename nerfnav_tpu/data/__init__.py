from nerfnav_tpu.data.provider import NeRFDataset, nerf_matrix_to_ngp, rand_poses
from nerfnav_tpu.data.rays import get_rays, get_all_rays

__all__ = ["NeRFDataset", "nerf_matrix_to_ngp", "rand_poses", "get_rays", "get_all_rays"]
