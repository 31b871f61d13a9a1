"""LPIPS perceptual distance in JAX (AlexNet backbone, LPIPS v0.1).

Capability parity: reference nerf/utils.py:221-255 (`LPIPSMeter` over the
`lpips` pip package). The pretrained weights cannot be fetched in this
zero-egress environment, so this module implements the NETWORK natively and
loads weights the user supplies:

    # on any machine with internet:
    python -c "import lpips, torch; \
        torch.save(lpips.LPIPS(net='alex').state_dict(), 'lpips_alex.pth')"
    # here:
    LPIPSMeter(net='alex', weights_path='lpips_alex.pth')

Architecture (lpips/lpips.py v0.1): input in [-1,1] -> scaling layer
(shift/scale) -> AlexNet features, tapping relu1..relu5 -> channel-unit-norm
-> squared diff -> per-layer 1x1 linear head (no bias) -> spatial mean ->
sum over layers. Convolutions run as lax.conv_general_dilated in NCHW; the
whole distance is one jitted function.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# torchvision AlexNet `features` indices of the five convs and the slice
# boundaries LPIPS taps (lpips/pretrained_networks.py alexnet: relu after
# each conv; maxpools at 2 and 5)
_CONV_IDX = (0, 3, 6, 8, 10)
_MAXPOOL_BEFORE = {3: True, 6: True}  # conv at idx 3/6 follows a maxpool
# LPIPS v0.1 scaling layer constants (lpips/lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_lpips_weights(path: str):
    """Load an `lpips.LPIPS(net='alex').state_dict()` saved by torch.

    Returns {"convs": [(w, b), ...5], "lins": [w0..w4], "shift", "scale"}
    with numpy arrays (convs in OIHW)."""
    if path.endswith(".npz"):
        data = np.load(path)
        sd = {k: data[k] for k in data.files}
    else:
        import torch

        sd = {k: v.detach().cpu().numpy()
              for k, v in torch.load(path, map_location="cpu",
                                     weights_only=False).items()}
    slices = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}
    convs = []
    for idx, sl in slices.items():
        w = sd[f"net.slice{sl}.{idx}.weight"].astype(np.float32)
        b = sd[f"net.slice{sl}.{idx}.bias"].astype(np.float32)
        convs.append((w, b))
    lins = [sd[f"lin{i}.model.1.weight"].astype(np.float32).reshape(1, -1)
            for i in range(5)]
    shift = sd.get("scaling_layer.shift", _SHIFT).reshape(3).astype(np.float32)
    scale = sd.get("scaling_layer.scale", _SCALE).reshape(3).astype(np.float32)
    return {"convs": convs, "lins": lins, "shift": shift, "scale": scale}


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        "VALID",
    )


def _alexnet_feats(weights, x):
    """x: (N, 3, H, W) scaled input -> list of 5 relu feature maps."""
    feats = []
    convs = weights["convs"]
    h = jax.nn.relu(_conv(x, convs[0][0], convs[0][1], 4, 2))
    feats.append(h)
    h = jax.nn.relu(_conv(_maxpool(h), convs[1][0], convs[1][1], 1, 2))
    feats.append(h)
    h = jax.nn.relu(_conv(_maxpool(h), convs[2][0], convs[2][1], 1, 1))
    feats.append(h)
    h = jax.nn.relu(_conv(h, convs[3][0], convs[3][1], 1, 1))
    feats.append(h)
    h = jax.nn.relu(_conv(h, convs[4][0], convs[4][1], 1, 1))
    feats.append(h)
    return feats


def _unit_norm(f, eps=1e-10):
    return f / (jnp.sqrt(jnp.sum(f**2, axis=1, keepdims=True)) + eps)


@partial(jax.jit, static_argnums=())
def _lpips_distance(weights, a, b):
    """a, b: (N, 3, H, W) in [-1, 1]. Returns (N,) distances."""
    shift = weights["shift"][None, :, None, None]
    scale = weights["scale"][None, :, None, None]
    fa = _alexnet_feats(weights, (a - shift) / scale)
    fb = _alexnet_feats(weights, (b - shift) / scale)
    total = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        d = (_unit_norm(x) - _unit_norm(y)) ** 2            # (N, C, H, W)
        lin = weights["lins"][i]                            # (1, C)
        per_px = jnp.einsum("nchw,oc->nohw", d, lin)        # (N, 1, H, W)
        total = total + jnp.mean(per_px, axis=(1, 2, 3))
    return total


class LPIPS:
    """Callable LPIPS distance over HWC float images in [0, 1]."""

    def __init__(self, weights_path: str):
        w = load_lpips_weights(weights_path)
        self.weights = {
            "convs": [(jnp.asarray(a), jnp.asarray(b)) for a, b in w["convs"]],
            "lins": [jnp.asarray(x) for x in w["lins"]],
            "shift": jnp.asarray(w["shift"]),
            "scale": jnp.asarray(w["scale"]),
        }

    def __call__(self, pred_hwc, gt_hwc):
        a = jnp.asarray(pred_hwc, jnp.float32).transpose(2, 0, 1)[None] * 2 - 1
        b = jnp.asarray(gt_hwc, jnp.float32).transpose(2, 0, 1)[None] * 2 - 1
        return float(_lpips_distance(self.weights, a, b)[0])
