"""Simulated robot agent: ground-truth dynamics + camera observations.

Capability parity: reference nav/agent_helpers.py (`Agent`, 34-213):
  * true 12-dim state propagated through `drone_dynamics` with injected
    Gaussian process noise (`add_noise_to_state`, 65-99; the reference's
    fault-injection mechanism, simulate.py:78-83)
  * body state -> camera pose with the camera-forward axis fixup
    (rot_x(pi/2) in the reference; here `BODY_TO_CAM`, same role)
  * observation backends:
      - "blender": the preserved file-RPC boundary — JSON pose ->
        `blender -b <blend> -P render_script -- pose.json img.png` -> PNG
        (agent_helpers.py:173-207, sim_img_cache protocol)
      - "nerf": renders the observation from a Field (the BASELINE.json-
        sanctioned Blender-free drop-in)
"""

import json
import os
import subprocess
from dataclasses import dataclass, field as dfield

import jax
import jax.numpy as jnp
import numpy as np

from nerfnav_tpu.nav.dynamics import DynamicsConfig, drone_dynamics
from nerfnav_tpu.nav.math_utils import vec_to_rot_matrix

# Camera mounted looking along body +x (drone forward); camera convention is
# +x right / +y down / +z forward (data/rays.py). Columns = camera axes in
# body coords: cam_x = -y_b, cam_y = -z_b, cam_z = +x_b.
# This is the role rot_x(pi/2) plays in the reference (agent_helpers.py:85-90).
BODY_TO_CAM = np.array(
    [[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]], np.float32
)


def body_state_to_camera_pose(x12):
    """(12,) state -> (4,4) camera-to-world pose. jnp-traceable (the
    estimator differentiates through this)."""
    R_body = vec_to_rot_matrix(x12[6:9])
    R_cam = R_body @ jnp.asarray(BODY_TO_CAM)
    pose = jnp.eye(4)
    pose = pose.at[:3, :3].set(R_cam)
    pose = pose.at[:3, 3].set(x12[0:3])
    return pose


def add_noise_to_state(state, std, mean=0.0, rng=None):
    """Gaussian process noise on all 12 dims (reference agent_helpers.py:26-31)."""
    rng = rng or np.random.default_rng()
    return state + rng.normal(mean, std, size=state.shape).astype(state.dtype)


@dataclass
class AgentConfig:
    dyn: DynamicsConfig = dfield(default_factory=DynamicsConfig)
    H: int = 800                      # observation resolution (simulate.py:308)
    W: int = 800
    focal: float = 800.0
    backend: str = "nerf"             # "nerf" | "blender"
    # blender backend options (reference simulate.py:227-234)
    blend_file: str = ""
    blender_cmd: str = "blender"
    cache_dir: str = "sim_img_cache"
    render_script: str = ""           # defaults to bundled sim/blender_render.py


class Agent:
    def __init__(self, start_state, cfg: AgentConfig, field=None, render_chunk=4096,
                 march=None):
        """field: models.Field for the nerf backend (+ optional
        (bitfield, MarchConfig) tuple in `march` for fast rendering)."""
        self.cfg = cfg
        self.state = np.asarray(start_state, np.float32)
        self.field = field
        self.march = march
        self._render = None
        self._chunk = render_chunk
        if cfg.backend == "blender":
            os.makedirs(cfg.cache_dir, exist_ok=True)

    @property
    def intrinsics(self):
        return np.array(
            [self.cfg.focal, self.cfg.focal, self.cfg.W / 2, self.cfg.H / 2],
            np.float32,
        )

    # ------------------------------------------------------------------ step
    def step(self, action, noise_std=0.0, noise_mean=0.0, rng=None):
        """Propagate true dynamics (+ noise), return (img_uint8, true_state).
        reference agent_helpers.py:65-99."""
        x = drone_dynamics(
            jnp.asarray(self.state), jnp.asarray(action, jnp.float32), self.cfg.dyn
        )
        x = np.asarray(x)
        if noise_std > 0 or noise_mean != 0:
            x = add_noise_to_state(x, noise_std, noise_mean, rng)
        self.state = x.astype(np.float32)
        pose = np.asarray(body_state_to_camera_pose(jnp.asarray(self.state)))
        img = self.get_img(pose)
        return img, self.state.copy(), pose

    # ---------------------------------------------------------- observation
    def get_img(self, pose):
        if self.cfg.backend == "nerf":
            return self._get_img_nerf(pose)
        return self._get_img_blender(pose)

    def _get_img_nerf(self, pose):
        from nerfnav_tpu.data.rays import get_all_rays
        from nerfnav_tpu.models import RenderConfig, render_rays, render_rays_grid

        if self._render is None:
            if self.march is not None:
                bitfield, mcfg = self.march

                @jax.jit
                def render(o, d):
                    return render_rays_grid(self.field, bitfield, mcfg, o, d,
                                            bg_color=1.0)
            else:
                rcfg = RenderConfig(num_steps=192, upsample_steps=0, min_near=0.05)

                @jax.jit
                def render(o, d):
                    return render_rays(self.field, rcfg, o, d, bg_color=1.0)

            self._render = render
        H, W = self.cfg.H, self.cfg.W
        rays = get_all_rays(jnp.asarray(pose, jnp.float32),
                            jnp.asarray(self.intrinsics), H, W)
        n = H * W
        chunk = self._chunk
        pad = (-n) % chunk
        ro = jnp.pad(rays["rays_o"], ((0, pad), (0, 0)))
        rd = jnp.pad(rays["rays_d"], ((0, pad), (0, 0)), constant_values=1.0)
        outs = [
            self._render(ro[i : i + chunk], rd[i : i + chunk])["image"]
            for i in range(0, n + pad, chunk)
        ]
        img = np.asarray(jnp.concatenate(outs)[:n]).reshape(H, W, 3)
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)

    def _get_img_blender(self, pose):
        """File-RPC to a headless Blender process (agent_helpers.py:173-207)."""
        import imageio.v2 as imageio

        cfg = self.cfg
        pose_path = os.path.join(cfg.cache_dir, "pose.json")
        img_path = os.path.join(cfg.cache_dir, "obs.png")
        with open(pose_path, "w") as f:
            json.dump(
                {
                    "pose": np.asarray(pose, np.float64).tolist(),
                    "res_x": cfg.W,
                    "res_y": cfg.H,
                    "trans": True,
                    "mode": "RGBA",
                }, f,
            )
        script = cfg.render_script or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "sim", "blender_render.py",
        )
        subprocess.run(
            [cfg.blender_cmd, "-b", cfg.blend_file, "-P", script, "--",
             pose_path, img_path],
            check=True, capture_output=True,
        )
        img = imageio.imread(img_path).astype(np.float32) / 255.0
        if img.shape[-1] == 4:  # white-background composite (agent_helpers.py:199)
            img = img[..., :3] * img[..., 3:] + (1.0 - img[..., 3:])
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)
