"""Dataset provider: transforms.json scenes (blender / colmap layouts).

Capability parity: reference nerf/provider.py (NeRFDataset, 94-332):
  * blender mode: per-split transforms_{train,val,test}.json (115-140)
  * colmap mode: single transforms.json with auto train/val split and a
    slerp-interpolated smooth test camera path (141-191)
  * `nerf_matrix_to_ngp` pose convention (19-27): axis cycling + column flips
    + scale/offset so scenes land inside the [-bound, bound] cube
  * per-image intrinsics from fl_x/fl_y or camera_angle_x (259-274)
  * device preload, optionally fp16 (246-256)
  * `rand_poses` orbit sampling for poseless/CLIP training (57-91)

TPU-native redesign: the reference's DataLoader-collate samples rays on CPU
per step (277-323); here the dataset exposes dense device arrays (poses,
images, intrinsics) and ray sampling happens *inside* the jitted train step
(data/rays.py) — zero host→device traffic per step once preloaded.
"""

import json
import os
from dataclasses import dataclass

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None
try:
    import imageio.v2 as imageio
except ImportError:  # pragma: no cover
    imageio = None


def nerf_matrix_to_ngp(pose: np.ndarray, scale: float = 0.33, offset=(0, 0, 0)):
    """OpenGL/Blender c2w -> ngp convention (reference provider.py:19-27).

    Cycles world axes (y,z,x) and flips the camera y/z columns, so the camera
    frame becomes +x right / +y down / +z forward, pairing with rays.py.
    """
    new_pose = np.array(
        [
            [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3] * scale + offset[0]],
            [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3] * scale + offset[1]],
            [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3] * scale + offset[2]],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
    return new_pose


def ngp_to_nerf_matrix(pose: np.ndarray, scale: float = 0.33, offset=(0, 0, 0)):
    """Inverse of `nerf_matrix_to_ngp` — ngp c2w back to OpenGL/Blender
    convention (used by the synthetic-scene writer and the sim boundary,
    cf. reference nav/math_utils.py:26-38 round-trips)."""
    new_pose = np.array(
        [
            [pose[2, 0], -pose[2, 1], -pose[2, 2], (pose[2, 3] - offset[2]) / scale],
            [pose[0, 0], -pose[0, 1], -pose[0, 2], (pose[0, 3] - offset[0]) / scale],
            [pose[1, 0], -pose[1, 1], -pose[1, 2], (pose[1, 3] - offset[1]) / scale],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
    return new_pose


def rand_poses(
    rng: np.random.Generator,
    size: int,
    radius: float = 1.0,
    theta_range=(np.pi / 3, 2 * np.pi / 3),
    phi_range=(0, 2 * np.pi),
):
    """Random orbit poses looking at the origin (reference provider.py:57-91).

    Returns (size, 4, 4) float32 c2w matrices in ngp convention.
    """
    thetas = rng.uniform(*theta_range, size)
    phis = rng.uniform(*phi_range, size)
    centers = np.stack(
        [
            radius * np.sin(thetas) * np.sin(phis),
            radius * np.cos(thetas),
            radius * np.sin(thetas) * np.cos(phis),
        ],
        axis=-1,
    )  # (size, 3)
    forward = -centers / np.linalg.norm(centers, axis=-1, keepdims=True)
    up = np.tile(np.array([0.0, 1.0, 0.0]), (size, 1))
    right = np.cross(up, forward)
    right /= np.linalg.norm(right, axis=-1, keepdims=True) + 1e-9
    down = np.cross(forward, right)
    poses = np.zeros((size, 4, 4), dtype=np.float32)
    poses[:, :3, 0] = right
    poses[:, :3, 1] = down
    poses[:, :3, 2] = forward
    poses[:, :3, 3] = centers
    poses[:, 3, 3] = 1.0
    return poses


def _load_image(path: str, downscale: int = 1) -> np.ndarray:
    """Load RGB(A) image -> float32 [0,1], (H, W, 3|4)."""
    img = imageio.imread(path)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    else:
        img = img.astype(np.float32)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    if downscale > 1:
        h, w = img.shape[:2]
        img = cv2.resize(
            img, (w // downscale, h // downscale), interpolation=cv2.INTER_AREA
        )
    return img


@dataclass
class DatasetOptions:
    """Flags consumed by the provider (subset of main_nerf.py:15-63)."""

    path: str = ""
    mode: str = "colmap"  # "colmap" | "blender" (auto-detected if files allow)
    scale: float = 0.33
    offset: tuple = (0.0, 0.0, 0.0)
    color_space: str = "srgb"  # "srgb" | "linear" (reference --color_space)
    downscale: int = 1
    preload: bool = True
    fp16: bool = False
    num_rays: int = 4096
    rand_pose: int = -1  # >=0 activates poseless random-orbit mode
    error_map: bool = False


class NeRFDataset:
    """Loads a transforms.json scene into dense arrays.

    Exposes: poses (N,4,4), images (N,H,W,C) float, intrinsics (4,), H, W.
    `.dataloader()` yields per-step dicts for the trainer; ray sampling itself
    happens inside the jitted train step (see Trainer).
    """

    def __init__(self, opt: DatasetOptions, split: str = "train", n_test: int = 10):
        self.opt = opt
        self.split = split
        root = opt.path

        # locate transforms file (reference provider.py:101-114)
        mode = opt.mode
        tpath = os.path.join(root, f"transforms_{split}.json")
        if os.path.exists(tpath):
            mode = "blender"
        else:
            tpath = os.path.join(root, "transforms.json")
            mode = "colmap"
        if not os.path.exists(tpath):
            raise FileNotFoundError(f"no transforms json under {root}")
        self.mode = mode
        with open(tpath) as f:
            meta = json.load(f)

        frames = meta["frames"]
        if mode == "colmap":
            # sorted for determinism, auto split (reference provider.py:141-162)
            frames = sorted(frames, key=lambda d: d["file_path"])
            if split == "train":
                frames = frames[1:]
            elif split == "val":
                frames = frames[:1]
            # test: smooth path handled below

        poses, images = [], []
        if mode == "colmap" and split == "test":
            poses = self._interpolate_test_path(frames, n_test, opt.scale,
                                                opt.offset)
            images = None
        else:
            for fr in frames:
                pose = np.array(fr["transform_matrix"], dtype=np.float32)
                poses.append(nerf_matrix_to_ngp(pose, opt.scale, opt.offset))
                fpath = os.path.join(root, fr["file_path"])
                if mode == "blender" and not os.path.splitext(fpath)[1]:
                    fpath += ".png"
                if os.path.exists(fpath):
                    img = _load_image(fpath, opt.downscale)
                    if opt.color_space == "linear":
                        from nerfnav_tpu.training.metrics import srgb_to_linear

                        img[..., :3] = srgb_to_linear(img[..., :3])
                    images.append(img)
            images = np.stack(images) if images else None

        self.poses = np.stack(poses) if isinstance(poses, list) else poses
        self.images = images
        if images is not None:
            self.H, self.W = images.shape[1:3]
        else:
            self.H = int(meta.get("h", 800)) // opt.downscale
            self.W = int(meta.get("w", 800)) // opt.downscale

        # intrinsics (reference provider.py:259-274)
        ds = opt.downscale
        if "fl_x" in meta or "fl_y" in meta:
            fx = meta.get("fl_x", meta.get("fl_y")) / ds
            fy = meta.get("fl_y", meta.get("fl_x")) / ds
        elif "camera_angle_x" in meta or "camera_angle_y" in meta:
            if "camera_angle_x" in meta:
                fx = self.W / (2 * np.tan(meta["camera_angle_x"] / 2))
            else:
                fx = None
            if "camera_angle_y" in meta:
                fy = self.H / (2 * np.tan(meta["camera_angle_y"] / 2))
            else:
                fy = None
            fx = fx if fx is not None else fy
            fy = fy if fy is not None else fx
        else:
            raise ValueError("cannot derive focal length from transforms json")
        cx = meta.get("cx", self.W / 2) / (ds if "cx" in meta else 1)
        cy = meta.get("cy", self.H / 2) / (ds if "cy" in meta else 1)
        self.intrinsics = np.array([fx, fy, cx, cy], dtype=np.float32)

        # per-image error maps for importance ray sampling (utils.py:310-315)
        if opt.error_map and split == "train" and self.images is not None:
            self.error_map = np.full((len(self.poses), 128 * 128), 0.1, np.float32)
        else:
            self.error_map = None

    @staticmethod
    def _interpolate_test_path(frames, n_test: int, scale: float = 0.33,
                               offset=(0, 0, 0), seed: int = 0):
        """Slerp-interpolated smooth camera path (reference provider.py:166-182):
        two RANDOM training frames slerped in NGP pose space with the
        reference's sine-eased ratio. The reference draws via globally seeded
        np.random (seed_everything); here the draw is seeded locally so the
        test path is reproducible across runs without global RNG state."""
        from scipy.spatial.transform import Rotation, Slerp

        f0, f1 = np.random.default_rng(seed).choice(frames, 2, replace=False)
        p0 = nerf_matrix_to_ngp(
            np.array(f0["transform_matrix"], dtype=np.float32), scale, offset
        )
        p1 = nerf_matrix_to_ngp(
            np.array(f1["transform_matrix"], dtype=np.float32), scale, offset
        )
        rots = Rotation.from_matrix(np.stack([p0[:3, :3], p1[:3, :3]]))
        slerp = Slerp([0, 1], rots)
        poses = []
        for i in range(n_test + 1):
            ratio = np.sin(((i / n_test) - 0.5) * np.pi) * 0.5 + 0.5
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = slerp(ratio).as_matrix()
            pose[:3, 3] = (1 - ratio) * p0[:3, 3] + ratio * p1[:3, 3]
            poses.append(pose)
        return np.stack(poses)

    def __len__(self):
        return len(self.poses)

    def as_arrays(self, dtype=None):
        """Device-preloadable dense arrays for the jitted training step."""
        import jax.numpy as jnp

        imgs = None
        if self.images is not None:
            im_dtype = jnp.float16 if self.opt.fp16 else jnp.float32
            imgs = jnp.asarray(self.images, dtype=im_dtype)
        return {
            "poses": jnp.asarray(self.poses),
            "images": imgs,
            "intrinsics": jnp.asarray(self.intrinsics),
        }

    def dataloader(self, steps_per_epoch: int | None = None, seed: int = 0):
        """Iterate per-step dicts: {"pose", "image", "index"} — image index
        scheduling on host, ray sampling in-jit (TPU-side)."""
        n = len(self.poses)
        steps = steps_per_epoch or n
        rng = np.random.default_rng(seed)
        for s in range(steps):
            idx = int(rng.integers(n)) if self.split == "train" else s % n
            yield {
                "index": idx,
                "pose": self.poses[idx],
                "image": None if self.images is None else self.images[idx],
            }
