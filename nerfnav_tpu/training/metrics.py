"""Evaluation metrics.

Capability parity: reference nerf/utils.py PSNRMeter (185-219) and LPIPSMeter
(221-255). LPIPS requires pretrained VGG/AlexNet weights which this
environment cannot download (zero egress); the meter degrades gracefully and
reports availability, keeping the API surface identical.
"""

import numpy as np


class PSNRMeter:
    """Accumulates PSNR = -10 log10(MSE) over image pairs (utils.py:185-219)."""

    def __init__(self):
        self.clear()

    def clear(self):
        self.V = 0.0
        self.N = 0

    def update(self, preds, truths):
        preds = np.asarray(preds, dtype=np.float32)
        truths = np.asarray(truths, dtype=np.float32)
        mse = float(np.mean((preds - truths) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        self.V += psnr
        self.N += 1
        return psnr

    def measure(self):
        return self.V / max(self.N, 1)

    def write(self, writer, global_step, prefix=""):
        if writer is not None:
            writer.add_scalar(f"{prefix}/PSNR", self.measure(), global_step)

    def report(self):
        return f"PSNR = {self.measure():.6f}"


class LPIPSMeter:
    """LPIPS perceptual metric (utils.py:221-255).

    Weight sources, in order:
      1. `weights_path` — an `lpips.LPIPS(net='alex').state_dict()` file the
         user supplies (see training/lpips_jax.py for the one-liner that
         produces it on an online machine); runs the native JAX
         implementation.
      2. the `lpips` pip package, if installed with its pretrained weights.
    With neither, `available` is False and update() raises with a clear
    message rather than silently returning garbage (pretrained weights
    cannot be fetched in this zero-egress environment)."""

    def __init__(self, net: str = "alex", weights_path: str | None = None):
        self.net = net
        self.V = 0.0
        self.N = 0
        self._fn = None
        self._jax_fn = None
        if weights_path is not None:
            from nerfnav_tpu.training.lpips_jax import LPIPS

            if net != "alex":
                raise ValueError(
                    "the native JAX LPIPS implements the 'alex' backbone; "
                    "use the lpips package for vgg/squeeze")
            self._jax_fn = LPIPS(weights_path)
            self.available = True
            return
        try:
            import lpips  # noqa: F401

            self._fn = lpips.LPIPS(net=net)
            self.available = True
        except Exception:
            self.available = False

    def clear(self):
        self.V = 0.0
        self.N = 0

    def update(self, preds, truths):
        if not self.available:
            raise RuntimeError(
                "LPIPS needs pretrained weights: pass "
                "LPIPSMeter(weights_path=...) with a saved "
                "lpips.LPIPS(net='alex').state_dict() (see "
                "training/lpips_jax.py), or install the `lpips` package — "
                "weights cannot be fetched in this offline environment"
            )
        if self._jax_fn is not None:
            v = self._jax_fn(np.asarray(preds, np.float32),
                             np.asarray(truths, np.float32))
        else:
            import torch

            p = torch.from_numpy(np.asarray(preds)).permute(2, 0, 1)[None] * 2 - 1
            t = torch.from_numpy(np.asarray(truths)).permute(2, 0, 1)[None] * 2 - 1
            v = float(self._fn(p.float(), t.float()).item())
        self.V += v
        self.N += 1
        return v

    def measure(self):
        return self.V / max(self.N, 1)

    def write(self, writer, global_step, prefix=""):
        if writer is not None:
            writer.add_scalar(f"{prefix}/LPIPS ({self.net})", self.measure(), global_step)

    def report(self):
        return f"LPIPS ({self.net}) = {self.measure():.6f}"


def linear_to_srgb(x):
    """reference utils.py:42-44 (torch.jit.script'd there)."""
    x = np.clip(x, 0, 1)
    return np.where(x <= 0.0031308, 12.92 * x, 1.055 * x ** (1 / 2.4) - 0.055)


def srgb_to_linear(x):
    """reference utils.py:46-49."""
    x = np.clip(x, 0, 1)
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)
