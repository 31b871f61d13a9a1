import threading
import urllib.request

import numpy as np
import pytest

from nerfnav_tpu.data import NeRFDataset
from nerfnav_tpu.data.provider import DatasetOptions
from nerfnav_tpu.data.synthetic import make_synthetic_scene
from nerfnav_tpu.gui import NeRFGUI, OrbitCamera
from nerfnav_tpu.models import NetworkConfig, RenderConfig
from nerfnav_tpu.training import Trainer, TrainerOptions


class TestOrbitCamera:
    def test_pose_orthonormal_and_looks_at_center(self):
        cam = OrbitCamera(64, 64, r=2.0)
        for az, el in [(0, 0), (1.0, 0.5), (-2.0, -1.0)]:
            cam.azimuth, cam.elevation = az, el
            p = cam.pose
            R = p[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            # forward axis points from eye to center
            fwd = (cam.center - p[:3, 3])
            fwd /= np.linalg.norm(fwd)
            np.testing.assert_allclose(R[:, 2], fwd, atol=1e-5)

    def test_orbit_and_zoom(self):
        cam = OrbitCamera(64, 64, r=2.0)
        p0 = cam.pose[:3, 3].copy()
        cam.orbit(50, 0)
        assert not np.allclose(cam.pose[:3, 3], p0)
        cam.scale(3)
        assert cam.radius < 2.0

    def test_intrinsics_from_fovy(self):
        cam = OrbitCamera(100, 80, fovy=90.0)
        np.testing.assert_allclose(cam.intrinsics[1], 40.0, rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_trainer(tmp_path_factory):
    d = tmp_path_factory.mktemp("gui_scene")
    make_synthetic_scene(str(d), n_train=3, n_val=1, H=32, W=32, num_steps=32)
    ds = NeRFDataset(DatasetOptions(path=str(d), scale=1.0), "train")
    cfg = NetworkConfig(bound=1.0, grid_levels=4, grid_log2_hashmap_size=10,
                        grid_max_resolution=32)
    rcfg = RenderConfig(num_steps=24, upsample_steps=0, min_near=0.05,
                        max_ray_batch=1024)
    opt = TrainerOptions(name="gui", workspace=str(d / "ws"), num_rays=128,
                         use_checkpoint="scratch", bg_train="white")
    return Trainer(cfg, rcfg, opt), ds


class TestNeRFGUI:
    def test_train_and_render_adaptive(self, tiny_trainer):
        trainer, ds = tiny_trainer
        gui = NeRFGUI(trainer, ds, W=48, H=48, radius=2.0)
        out = gui.train_step()
        assert out is not None and np.isfinite(out["loss"])
        frame = gui.render_frame()
        assert frame.shape == (48, 48, 3)
        assert gui.spp == 1 and gui._acc_scale < 1.0
        # idle passes spend compute on progressive-resolution refinement
        # first (the renderer is deterministic — averaging identical frames
        # would be dead work); spp holds at 1 while the scale doubles
        gui.render_frame()
        assert gui.spp == 1 and gui._acc_scale > 0.25
        for _ in range(8):
            if gui._acc_scale >= 1.0:
                break
            gui.render_frame()
        assert gui._acc_scale == 1.0
        # at full resolution, jittered anti-aliasing passes accumulate spp
        gui.render_frame()
        assert gui.spp == 2
        # camera move resets accumulation
        gui.cam.orbit(10, 0)
        gui.touch()
        gui.render_frame()
        assert gui.spp == 1

    def test_halton_offsets_centered(self):
        from nerfnav_tpu.gui.viewer import _halton_offset

        offs = np.array([_halton_offset(i) for i in range(1, 17)])
        assert np.all(offs >= -0.5) and np.all(offs < 0.5)
        # low-discrepancy: the mean of the first 16 offsets is near zero
        assert np.all(np.abs(offs.mean(axis=0)) < 0.1)
        # offsets are distinct across passes
        assert len({tuple(o) for o in offs}) == 16

    def test_pixel_offset_shifts_rays(self):
        import jax.numpy as jnp

        from nerfnav_tpu.data.rays import get_all_rays

        pose = jnp.eye(4)
        intr = jnp.asarray([32.0, 32.0, 16.0, 16.0])
        r0 = get_all_rays(pose, intr, 32, 32)
        r1 = get_all_rays(pose, intr, 32, 32, offset=(0.25, -0.25))
        assert not np.allclose(r0["rays_d"], r1["rays_d"])
        # a subpixel offset must move directions by less than a pixel pitch
        assert float(jnp.abs(r0["rays_d"] - r1["rays_d"]).max()) < 1.0 / 16

    def test_web_server_smoke(self, tiny_trainer):
        trainer, ds = tiny_trainer
        gui = NeRFGUI(trainer, None, W=32, H=32)
        gui.training = False
        port = 7903

        t = threading.Thread(target=gui.serve,
                             kwargs={"port": port, "steps": 2}, daemon=True)
        t.start()
        import time

        time.sleep(0.3)
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read()
        assert b"<html>" in html or b"<script>" in html
        jpg = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame", timeout=60).read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG magic
        t.join(timeout=30)


class TestWidgets:
    """Widget parity with reference gui.py:156-412: ckpt save, mesh export,
    bg color, fovy, dt_gamma, per-axis AABB crop, pan, dynamic-res toggle."""

    def test_set_options(self, tiny_trainer):
        trainer, ds = tiny_trainer
        gui = NeRFGUI(trainer, None, W=32, H=32)
        gui.set_option("bg_color", 0.5)
        assert gui.bg_color == 0.5
        gui.set_option("fovy", 90)
        assert gui.cam.fovy == 90
        gui.set_option("max_spp", 8)
        assert gui.max_spp == 8
        gui.set_option("dynamic_resolution", False)
        assert gui.downscale == 1.0
        gui.set_option("aabb_xmax", 0.25)
        assert gui.aabb[3] == 0.25 and gui._crop is not None
        with pytest.raises(KeyError):
            gui.set_option("nope", 1)

    def test_pan_moves_center(self, tiny_trainer):
        trainer, ds = tiny_trainer
        gui = NeRFGUI(trainer, None, W=32, H=32)
        c0 = gui.cam.center.copy()
        gui.cam.pan(200, 0)
        assert not np.allclose(gui.cam.center, c0)

    def test_crop_masks_render(self, tiny_trainer):
        """A crop box excluding the scene must render pure background."""
        trainer, ds = tiny_trainer
        if trainer.state is None:
            trainer.state = trainer._init_state(len(ds))
        gui = NeRFGUI(trainer, None, W=24, H=24, bg_color=1.0)
        full = gui.render_frame()
        gui.set_option("aabb_xmin", 0.9)
        gui.set_option("aabb_xmax", 0.95)
        gui.set_option("aabb_ymin", 0.9)
        gui.set_option("aabb_ymax", 0.95)
        cropped = gui.render_frame()
        assert cropped.shape == full.shape
        np.testing.assert_allclose(cropped, np.ones_like(cropped), atol=1e-3)

    def test_reset_reinitializes_model(self, tiny_trainer):
        """Reset button (reference gui.py:215-228): new weights, zeroed
        occupancy/step counters, view marked dirty."""
        trainer, ds = tiny_trainer
        gui = NeRFGUI(trainer, ds, W=32, H=32)
        gui.train_step()
        before = np.asarray(trainer.state.params["sigma_net"][0])
        step_before = trainer.global_step
        assert step_before > 0
        msg = gui.reset_model()
        assert "reset" in msg
        assert trainer.global_step == 0
        after = np.asarray(trainer.state.params["sigma_net"][0])
        assert not np.allclose(before, after)
        if trainer.state.occupancy is not None:
            assert float(trainer.state.occupancy["density_grid"].max()) == 0.0
        assert gui._dirty
        # training still works after a reset
        out = gui.train_step()
        assert out is not None and np.isfinite(out["loss"])

    def test_ckpt_and_mesh_endpoints(self, tiny_trainer, tmp_path):
        trainer, ds = tiny_trainer
        gui = NeRFGUI(trainer, ds, W=32, H=32)
        gui.train_step()
        msg = gui.save_checkpoint()
        assert "saved" in msg
        import os

        assert any(
            f.endswith(".npz")
            for f in os.listdir(os.path.join(trainer.workspace, "checkpoints"))
        )
        msg = gui.export_mesh()
        assert "mesh" in msg

    def test_dt_gamma_rebuilds_render_path(self, tiny_trainer):
        import dataclasses

        from nerfnav_tpu.models.occupancy import OccupancyConfig, init_occupancy_state
        from nerfnav_tpu.ops.marching import MarchConfig

        trainer, ds = tiny_trainer
        # give the trainer a march config so dt_gamma has a target
        old_march = trainer.march_cfg
        trainer.march_cfg = MarchConfig(bound=1.0, grid_size=16, max_steps=64,
                                        samples_per_ray=8, min_near=0.05)
        trainer._render_chunk_fns = {0: object()}  # sentinel: must be dropped
        gui = NeRFGUI(trainer, None, W=32, H=32)
        gui.set_option("dt_gamma", 1 / 128)
        assert trainer.march_cfg.dt_gamma == 1 / 128
        assert trainer._render_chunk_fns == {}
        trainer.march_cfg = old_march
