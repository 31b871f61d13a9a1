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
        # spp accumulates while the camera is still
        gui.render_frame()
        assert gui.spp == 2
        # camera move resets accumulation
        gui.cam.orbit(10, 0)
        gui.touch()
        gui.render_frame()
        assert gui.spp == 1

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
