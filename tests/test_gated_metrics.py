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


def test_clip_loss_gated():
    from nerfnav_tpu.training.clip_loss import CLIPLoss

    c = CLIPLoss("a red chair")
    if c.available:  # pragma: no cover - offline image
        pytest.skip("CLIP weights available in this environment")
    with pytest.raises(RuntimeError):
        c.score(np.zeros((32, 32, 3), np.float32))
