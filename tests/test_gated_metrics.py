"""Gated-dependency behavior: CLIP loss and LPIPS need pretrained weights
that cannot be fetched offline — the APIs must exist (reference parity:
clip_utils.py, lpips in utils.py:318-322) and fail loudly, not crash at
import or silently return garbage."""

import numpy as np
import pytest

from nerfnav_tpu.training.metrics import LPIPSMeter, PSNRMeter


def test_psnr_meter():
    m = PSNRMeter()
    a = np.zeros((2, 4, 4, 3), np.float32)
    b = np.full((2, 4, 4, 3), 0.1, np.float32)
    m.update(a, b)
    assert 19.0 < m.measure() < 21.0  # psnr of mse 0.01 = 20 dB
    assert "PSNR" in m.report()
    m.clear()
    assert m.measure() == 0


def test_lpips_gated():
    m = LPIPSMeter()
    if m.available:  # pragma: no cover - offline image
        pytest.skip("lpips weights available in this environment")
    with pytest.raises(RuntimeError, match="LPIPS"):
        m.update(np.zeros((1, 4, 4, 3)), np.zeros((1, 4, 4, 3)))


def _fake_lpips_state_dict(rng, torch):
    """lpips.LPIPS(net='alex').state_dict()-shaped dict, random values."""
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    slices = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}
    sd = {
        "scaling_layer.shift": torch.tensor([[[-0.030]], [[-0.088]],
                                             [[-0.188]]]).reshape(1, 3, 1, 1),
        "scaling_layer.scale": torch.tensor([[[0.458]], [[0.448]],
                                             [[0.450]]]).reshape(1, 3, 1, 1),
    }
    for (idx, sl), shp in zip(slices.items(), shapes):
        sd[f"net.slice{sl}.{idx}.weight"] = torch.from_numpy(
            rng.normal(size=shp).astype(np.float32) * 0.05)
        sd[f"net.slice{sl}.{idx}.bias"] = torch.from_numpy(
            rng.normal(size=shp[0]).astype(np.float32) * 0.05)
    for i, c in enumerate([64, 192, 384, 256, 256]):
        sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32))
    return sd


class TestJaxLPIPS:
    def test_native_lpips_from_weights_file(self, tmp_path):
        """LPIPSMeter(weights_path=...) runs the JAX network: zero for
        identical images, positive for different ones."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        path = str(tmp_path / "lpips_alex.pth")
        torch.save(_fake_lpips_state_dict(rng, torch), path)

        m = LPIPSMeter(weights_path=path)
        assert m.available
        img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        assert m.update(img, img) == pytest.approx(0.0, abs=1e-6)
        other = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        v = m.update(img, other)
        assert np.isfinite(v) and v > 0
        assert m.N == 2

    def test_matches_torch_oracle(self, tmp_path):
        """The JAX forward must match a torch reimplementation of the LPIPS
        v0.1 graph (scaling -> alexnet relu taps -> unit-norm -> diff^2 ->
        1x1 lin -> spatial mean -> sum) on the same random weights."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(1)
        path = str(tmp_path / "lpips_alex.pth")
        sd = _fake_lpips_state_dict(rng, torch)
        torch.save(sd, path)

        from nerfnav_tpu.training.lpips_jax import LPIPS

        fn = LPIPS(path)
        a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        b = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        ours = fn(a, b)

        def feats(x):
            h = (x - sd["scaling_layer.shift"]) / sd["scaling_layer.scale"]
            out = []
            convs = [(sd["net.slice1.0.weight"], sd["net.slice1.0.bias"], 4, 2),
                     (sd["net.slice2.3.weight"], sd["net.slice2.3.bias"], 1, 2),
                     (sd["net.slice3.6.weight"], sd["net.slice3.6.bias"], 1, 1),
                     (sd["net.slice4.8.weight"], sd["net.slice4.8.bias"], 1, 1),
                     (sd["net.slice5.10.weight"], sd["net.slice5.10.bias"], 1, 1)]
            for i, (w, bias, s, p) in enumerate(convs):
                if i in (1, 2):
                    h = F.max_pool2d(h, 3, 2)
                h = F.relu(F.conv2d(h, w, bias, stride=s, padding=p))
                out.append(h)
            return out

        ta = torch.from_numpy(a).permute(2, 0, 1)[None] * 2 - 1
        tb = torch.from_numpy(b).permute(2, 0, 1)[None] * 2 - 1
        fa, fb = feats(ta), feats(tb)
        ref = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            xn = x / (x.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            yn = y / (y.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (xn - yn).pow(2)
            lin = sd[f"lin{i}.model.1.weight"]
            ref += float(F.conv2d(d, lin).mean())
        assert ours == pytest.approx(ref, rel=1e-4)


def test_clip_mode_gated():
    """rand_pose mode without a clip_loss_fn must fail loudly (trainer gate)."""
    from nerfnav_tpu.models import NetworkConfig, RenderConfig
    from nerfnav_tpu.training import Trainer, TrainerOptions

    import tempfile

    opt = TrainerOptions(name="gated", workspace=tempfile.mkdtemp(),
                         rand_pose=0, use_checkpoint="scratch")
    with pytest.raises(RuntimeError, match="clip_loss_fn"):
        Trainer(NetworkConfig(bound=1.0), RenderConfig(), opt)
