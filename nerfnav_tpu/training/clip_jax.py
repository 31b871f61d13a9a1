"""CLIP vision tower in JAX (ViT, HF CLIPVisionModelWithProjection graph).

Capability parity: reference nerf/clip_utils.py (`CLIPLoss`, ViT-B/16
similarity loss for text-guided poseless training, utils.py:381-424). The
pretrained weights cannot be fetched in this zero-egress environment, so —
like training/lpips_jax.py — the NETWORK is implemented natively and the
user supplies weights plus a precomputed text embedding:

    # on any machine with internet:
    python - <<'PY'
    import torch
    from transformers import CLIPModel, CLIPProcessor
    m = CLIPModel.from_pretrained("openai/clip-vit-base-patch16")
    torch.save(m.state_dict(), "clip_vitb16.pth")
    proc = CLIPProcessor.from_pretrained("openai/clip-vit-base-patch16")
    t = proc(text=["a red chair"], return_tensors="pt")
    import numpy as np
    np.save("text_embed.npy",
            m.get_text_features(**t).detach().numpy()[0])
    PY
    # here:
    loss_fn = make_clip_loss_fn("clip_vitb16.pth", "text_embed.npy")
    Trainer(..., clip_loss_fn=loss_fn)   # with opt.rand_pose >= 0

Only the image tower runs in-loop (it is the differentiable half — the text
embedding is a constant); implementing the BPE tokenizer + text transformer
here would add nothing to the training path. The forward matches HF's
CLIPVisionModelWithProjection (verified against it on random tiny configs in
tests/test_clip_jax.py): patch-conv embed + class token + learned positions,
pre-LN, N transformer blocks (MHA with q-scaling, quick_gelu MLP),
post-LN on the class token, linear projection.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

# OpenAI CLIP preprocessing constants
_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def load_clip_vision_weights(path: str, num_heads: int | None = None):
    """Load a CLIPModel / CLIPVisionModelWithProjection state_dict saved by
    torch; returns (weights pytree, config dict). Text-tower keys are
    ignored."""
    if path.endswith(".npz"):
        data = np.load(path)
        sd = {k: data[k] for k in data.files}
    else:
        import torch

        sd = {k: v.detach().cpu().numpy()
              for k, v in torch.load(path, map_location="cpu",
                                     weights_only=False).items()}
    g = lambda k: jnp.asarray(sd[k], jnp.float32)  # noqa: E731
    pe = sd["vision_model.embeddings.patch_embedding.weight"]
    hidden, _, patch, _ = pe.shape
    pos = sd["vision_model.embeddings.position_embedding.weight"]
    grid = int(round(math.sqrt(pos.shape[0] - 1)))
    layers = []
    i = 0
    while f"vision_model.encoder.layers.{i}.layer_norm1.weight" in sd:
        p = f"vision_model.encoder.layers.{i}."
        layers.append({
            "ln1": (g(p + "layer_norm1.weight"), g(p + "layer_norm1.bias")),
            "ln2": (g(p + "layer_norm2.weight"), g(p + "layer_norm2.bias")),
            "q": (g(p + "self_attn.q_proj.weight"), g(p + "self_attn.q_proj.bias")),
            "k": (g(p + "self_attn.k_proj.weight"), g(p + "self_attn.k_proj.bias")),
            "v": (g(p + "self_attn.v_proj.weight"), g(p + "self_attn.v_proj.bias")),
            "o": (g(p + "self_attn.out_proj.weight"), g(p + "self_attn.out_proj.bias")),
            "fc1": (g(p + "mlp.fc1.weight"), g(p + "mlp.fc1.bias")),
            "fc2": (g(p + "mlp.fc2.weight"), g(p + "mlp.fc2.bias")),
        })
        i += 1
    weights = {
        "patch": g("vision_model.embeddings.patch_embedding.weight"),
        "cls": g("vision_model.embeddings.class_embedding"),
        "pos": g("vision_model.embeddings.position_embedding.weight"),
        "pre_ln": (g("vision_model.pre_layrnorm.weight"),
                   g("vision_model.pre_layrnorm.bias")),
        "post_ln": (g("vision_model.post_layernorm.weight"),
                    g("vision_model.post_layernorm.bias")),
        "proj": g("visual_projection.weight"),
        "layers": layers,
    }
    cfg = {
        "hidden": hidden,
        "patch": patch,
        "image_size": grid * patch,
        # CLIP ViTs use 64-dim heads (B/16: 768/64=12, L/14: 1024/64=16)
        "heads": num_heads if num_heads is not None else max(hidden // 64, 1),
    }
    return weights, cfg


def _ln(x, wb, eps=1e-5):
    w, b = wb
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _linear(x, wb):
    w, b = wb
    return x @ w.T + b


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_image_embed(weights, cfg, pixel_values):
    """pixel_values: (3, H, W) normalized — returns the (proj_dim,) image
    embedding (HF CLIPVisionModelWithProjection.image_embeds)."""
    h = jax.lax.conv_general_dilated(
        pixel_values[None], weights["patch"],
        window_strides=(cfg["patch"], cfg["patch"]), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]                                                     # (C, gh, gw)
    tokens = h.reshape(cfg["hidden"], -1).T                  # (gh*gw, C)
    tokens = jnp.concatenate([weights["cls"][None], tokens], axis=0)
    tokens = tokens + weights["pos"]
    x = _ln(tokens, weights["pre_ln"])
    nh = cfg["heads"]
    hd = cfg["hidden"] // nh
    scale = hd ** -0.5
    for lw in weights["layers"]:
        r = _ln(x, lw["ln1"])
        q = (_linear(r, lw["q"]) * scale).reshape(-1, nh, hd)
        k = _linear(r, lw["k"]).reshape(-1, nh, hd)
        v = _linear(r, lw["v"]).reshape(-1, nh, hd)
        att = jax.nn.softmax(jnp.einsum("qhd,khd->hqk", q, k), axis=-1)
        r = jnp.einsum("hqk,khd->qhd", att, v).reshape(-1, cfg["hidden"])
        x = x + _linear(r, lw["o"])
        r = _ln(x, lw["ln2"])
        x = x + _linear(_quick_gelu(_linear(r, lw["fc1"])), lw["fc2"])
    pooled = _ln(x[0], weights["post_ln"])
    return pooled @ weights["proj"].T


def preprocess(image_hwc, image_size):
    """(H, W, 3) float [0,1] -> (3, S, S) CLIP-normalized, differentiable."""
    img = jax.image.resize(image_hwc, (image_size, image_size, 3), "bilinear")
    img = (img - _MEAN) / _STD
    return img.transpose(2, 0, 1)


def make_clip_loss_fn(weights_path: str, text_embed, num_heads=None):
    """Build the jax-differentiable scorer Trainer.clip_loss_fn expects:
    loss(image (h, w, 3) in [0,1]) = 1 - cos(CLIP_image(image), text_embed).

    text_embed: (proj_dim,) array or a .npy path (precomputed text-tower
    output — constant w.r.t. the rendered image, so the text transformer
    never needs to run in-loop)."""
    weights, cfg = load_clip_vision_weights(weights_path, num_heads)
    if isinstance(text_embed, str):
        text_embed = np.load(text_embed)
    t = jnp.asarray(text_embed, jnp.float32)
    t = t / jnp.linalg.norm(t)

    def loss_fn(image):
        emb = clip_image_embed(weights, cfg, preprocess(image, cfg["image_size"]))
        emb = emb / (jnp.linalg.norm(emb) + 1e-8)
        return 1.0 - jnp.dot(emb, t)

    return loss_fn
