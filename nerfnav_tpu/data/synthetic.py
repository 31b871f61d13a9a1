"""Synthetic scene generation: render analytic fields to a transforms.json
dataset on disk.

This formalizes the reference's latent fake-backend test pattern
(quad_plot.py:442-443 `get_manual_nerf("empty"/"cylinder")`) into a first-
class tool: every data-dependent component (provider, trainer, eval, nav) is
exercisable without downloading a dataset or a pretrained checkpoint.
"""

import json
import os

import jax.numpy as jnp
import numpy as np

from nerfnav_tpu.data.provider import ngp_to_nerf_matrix, rand_poses
from nerfnav_tpu.data.rays import get_all_rays
from nerfnav_tpu.models import Field, RenderConfig, render_rays


def sphere_field(radius=0.5, sigma=200.0, bound=1.0):
    """Opaque sphere with position-dependent color (so views differ)."""

    def density_fn(x):
        inside = jnp.linalg.norm(x, axis=-1) < radius
        return jnp.where(inside, sigma, 0.0), x

    def color_fn(d, geo):
        return jnp.clip(geo * 0.8 + 0.6, 0.0, 1.0)

    return Field(density_fn=density_fn, color_fn=color_fn, bound=bound)


def cylinder_field(radius=0.4, sigma=200.0, bound=1.0):
    """Infinite vertical cylinder — the planner's classic obstacle
    (reference quad_plot.py:442-443 `get_manual_nerf("cylinder")`)."""

    def density_fn(x):
        inside = jnp.linalg.norm(x[:, :2], axis=-1) < radius
        return jnp.where(inside, sigma, 0.0), x

    def color_fn(d, geo):
        return jnp.full((d.shape[0], 3), 0.7)

    return Field(density_fn=density_fn, color_fn=color_fn, bound=bound)


def textured_sphere_field(radius=0.5, sigma=300.0, bound=1.0):
    """Opaque sphere with high-frequency color texture — gives SIFT corners
    for the pose filter and view-dependent structure for NeRF fitting."""
    import jax

    def density_fn(x):
        d = jnp.sqrt(jnp.sum(x * x, axis=-1) + 1e-12)
        return sigma * jax.nn.sigmoid((radius - d) * 40.0), x

    def color_fn(d, geo):
        checker = (
            jnp.sin(20.0 * geo[:, 0])
            * jnp.sin(20.0 * geo[:, 1])
            * jnp.sin(20.0 * geo[:, 2])
        )
        r = 0.5 + 0.5 * jnp.sin(17.0 * geo[:, 0] + 3.0 * geo[:, 1])
        g = 0.5 + 0.5 * checker
        b = 0.5 + 0.5 * jnp.cos(13.0 * geo[:, 2])
        return jnp.stack([r, g, b], axis=-1)

    return Field(density_fn=density_fn, color_fn=color_fn, bound=bound)


def cluttered_field(sigma=300.0, bound=1.0):
    """Multi-object analytic scene: a textured floor slab, three spheres at
    different scales, and two axis-aligned boxes — structure across spatial
    frequencies, for validating hash-grid architectures beyond the
    single-sphere harness (a single blob under-tests the multiresolution
    claim that fixes level count / level width)."""
    import jax

    spheres = jnp.asarray([  # x, y, z, r
        [-0.35, -0.30, -0.28, 0.22],
        [0.40, 0.25, -0.30, 0.14],
        [0.05, 0.45, -0.42, 0.08],
    ])
    boxes = jnp.asarray([  # cx, cy, cz, hx, hy, hz
        [0.30, -0.40, -0.38, 0.15, 0.10, 0.12],
        [-0.30, 0.35, -0.44, 0.08, 0.18, 0.06],
    ])

    def sdf(x):
        d_floor = x[:, 2] + 0.55  # slab below z = -0.55
        ds = [d_floor]
        for i in range(spheres.shape[0]):
            c, r = spheres[i, :3], spheres[i, 3]
            ds.append(jnp.sqrt(jnp.sum((x - c) ** 2, -1) + 1e-12) - r)
        for i in range(boxes.shape[0]):
            c, h = boxes[i, :3], boxes[i, 3:]
            q = jnp.abs(x - c) - h
            outside = jnp.sqrt(jnp.sum(jnp.maximum(q, 0.0) ** 2, -1) + 1e-12)
            inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
            ds.append(outside + inside)
        return jnp.min(jnp.stack(ds, -1), -1)

    def density_fn(x):
        import jax as _jax

        return sigma * _jax.nn.sigmoid(-sdf(x) * 60.0), x

    def color_fn(d, geo):
        hf = jnp.sin(25.0 * geo[:, 0]) * jnp.sin(25.0 * geo[:, 1])
        r = 0.5 + 0.5 * jnp.sin(11.0 * geo[:, 0] + 5.0 * geo[:, 2])
        g = 0.5 + 0.4 * hf + 0.1 * jnp.sin(7.0 * geo[:, 1])
        b = 0.5 + 0.5 * jnp.cos(9.0 * (geo[:, 1] + geo[:, 2]))
        return jnp.clip(jnp.stack([r, g, b], -1), 0.0, 1.0)

    return Field(density_fn=density_fn, color_fn=color_fn, bound=bound)


def make_synthetic_scene(
    out_dir: str,
    field: Field = None,
    n_train: int = 12,
    n_val: int = 2,
    H: int = 64,
    W: int = 64,
    fov_x: float = 0.9,
    radius: float = 1.8,
    seed: int = 0,
    num_steps: int = 128,
):
    """Write a blender-layout dataset (transforms_{train,val}.json + RGBA
    pngs) rendered from `field`. Poses stored in OpenGL convention with
    scale=1.0 so the provider round-trips them exactly."""
    import imageio.v2 as imageio

    field = field or sphere_field()
    rng = np.random.default_rng(seed)
    fx = W / (2 * np.tan(fov_x / 2))
    intr = jnp.asarray([fx, fx, W / 2, H / 2], jnp.float32)
    rcfg = RenderConfig(num_steps=num_steps, upsample_steps=0, min_near=0.05)

    os.makedirs(out_dir, exist_ok=True)
    # chunk the ground-truth renders: a full 800^2 frame is 640k rays x
    # num_steps samples — far past HBM for one program; 64k-ray chunks keep
    # the peak bounded at any resolution (one static chunk shape, padded)
    chunk = min(H * W, 65536)

    import jax

    @jax.jit
    def _render_chunk(ro, rd):
        out = render_rays(field, rcfg, ro, rd, bg_color=0.0)
        return out["image"], out["weights_sum"]

    def _render_frame(pose):
        rays = get_all_rays(jnp.asarray(pose), intr, H, W)
        n_r = H * W
        pad = (-n_r) % chunk
        ro = jnp.concatenate([rays["rays_o"], jnp.zeros((pad, 3))]) if pad else rays["rays_o"]
        rd = (jnp.concatenate([rays["rays_d"], jnp.ones((pad, 3))])
              if pad else rays["rays_d"])
        imgs, ws = [], []
        for s in range(0, n_r + pad, chunk):
            im, w = _render_chunk(ro[s:s + chunk], rd[s:s + chunk])
            imgs.append(np.asarray(im))
            ws.append(np.asarray(w))
        return (np.concatenate(imgs)[:n_r].reshape(H, W, 3),
                np.concatenate(ws)[:n_r].reshape(H, W, 1))

    for split, n in [("train", n_train), ("val", n_val)]:
        poses_ngp = rand_poses(rng, n, radius=radius)
        frames = []
        for i, pose in enumerate(poses_ngp):
            rgb, alpha = _render_frame(pose)
            # un-premultiply so provider's alpha-composite reproduces rgb
            rgba = np.concatenate([np.divide(rgb, np.maximum(alpha, 1e-4)), alpha], -1)
            rgba = (np.clip(rgba, 0, 1) * 255).astype(np.uint8)
            fname = f"{split}_{i:03d}.png"
            imageio.imwrite(os.path.join(out_dir, fname), rgba)
            frames.append(
                {
                    "file_path": fname,
                    "transform_matrix": ngp_to_nerf_matrix(pose, 1.0).tolist(),
                }
            )
        meta = {"camera_angle_x": float(fov_x), "frames": frames, "h": H, "w": W}
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    return out_dir
