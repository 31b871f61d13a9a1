from nerfnav_tpu.models.network import (
    NetworkConfig,
    init_network,
    density,
    color,
    forward,
    background,
)

from nerfnav_tpu.models.renderer import (
    Field,
    RenderConfig,
    make_field,
    render_rays,
    render_rays_frozen,
    render_rays_grid,
    render_rays_grid_rounds,
    render_image,
    composite,
    sample_pdf,
    near_far_from_aabb,
    aabb_of,
)

__all__ = [
    "NetworkConfig",
    "init_network",
    "density",
    "color",
    "forward",
    "background",
    "Field",
    "RenderConfig",
    "make_field",
    "render_rays",
    "render_rays_frozen",
    "render_rays_grid",
    "render_rays_grid_rounds",
    "render_image",
    "composite",
    "sample_pdf",
    "near_far_from_aabb",
    "aabb_of",
]
