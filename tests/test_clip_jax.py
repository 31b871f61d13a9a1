"""Native JAX CLIP vision tower vs the transformers implementation (true
oracle: HF CLIPVisionModelWithProjection with a random tiny config)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_clip(tmp_path_factory):
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
        projection_dim=16,
    )
    torch.manual_seed(0)
    model = CLIPVisionModelWithProjection(cfg).eval()
    path = str(tmp_path_factory.mktemp("clip") / "clip_tiny.pth")
    torch.save(model.state_dict(), path)
    return model, path


class TestClipVisionParity:
    def test_image_embed_matches_hf(self, tiny_clip):
        from nerfnav_tpu.training.clip_jax import (
            clip_image_embed, load_clip_vision_weights,
        )

        model, path = tiny_clip
        weights, cfg = load_clip_vision_weights(path, num_heads=4)
        assert cfg == {"hidden": 32, "patch": 8, "image_size": 32, "heads": 4}

        rng = np.random.default_rng(0)
        px = rng.normal(size=(3, 32, 32)).astype(np.float32)
        ours = np.asarray(clip_image_embed(weights, cfg, jnp.asarray(px)))
        with torch.no_grad():
            ref = model(torch.from_numpy(px)[None]).image_embeds[0].numpy()
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)

    def test_loss_fn_differentiable_and_sane(self, tiny_clip):
        """make_clip_loss_fn: jittable, grad flows to the image, loss in
        [0, 2], and the image's OWN embedding scores ~0 against itself."""
        from nerfnav_tpu.training.clip_jax import (
            clip_image_embed, load_clip_vision_weights, make_clip_loss_fn,
            preprocess,
        )

        model, path = tiny_clip
        rng = np.random.default_rng(1)
        img = rng.uniform(size=(24, 24, 3)).astype(np.float32)

        weights, cfg = load_clip_vision_weights(path, num_heads=4)
        self_embed = clip_image_embed(
            weights, cfg, preprocess(jnp.asarray(img), cfg["image_size"]))
        loss_fn = make_clip_loss_fn(path, np.asarray(self_embed), num_heads=4)
        loss, grad = jax.jit(jax.value_and_grad(loss_fn))(jnp.asarray(img))
        assert float(loss) == pytest.approx(0.0, abs=1e-5)
        other = make_clip_loss_fn(path, rng.normal(size=16), num_heads=4)
        loss2, grad2 = jax.jit(jax.value_and_grad(other))(jnp.asarray(img))
        assert 0.0 <= float(loss2) <= 2.0
        assert np.isfinite(np.asarray(grad2)).all()
        assert float(jnp.abs(grad2).max()) > 0

    def test_trainer_rand_pose_with_real_tower(self, tiny_clip, tmp_path):
        """End-to-end: the poseless training loop runs with the native CLIP
        tower as the scorer (reference utils.py:381-424 semantics)."""
        from nerfnav_tpu.data import NeRFDataset
        from nerfnav_tpu.data.provider import DatasetOptions
        from nerfnav_tpu.data.synthetic import make_synthetic_scene
        from nerfnav_tpu.models import NetworkConfig, RenderConfig
        from nerfnav_tpu.training import Trainer, TrainerOptions
        from nerfnav_tpu.training.clip_jax import make_clip_loss_fn

        model, path = tiny_clip
        d = str(tmp_path / "scene")
        make_synthetic_scene(d, n_train=2, n_val=1, H=24, W=24, num_steps=24)
        ds = NeRFDataset(DatasetOptions(path=d, scale=1.0), "train")
        cfg = NetworkConfig(bound=1.0, grid_levels=4,
                            grid_log2_hashmap_size=10, grid_max_resolution=32)
        rcfg = RenderConfig(num_steps=16, upsample_steps=0, min_near=0.05,
                            max_ray_batch=576)
        opt = TrainerOptions(name="clip", workspace=str(tmp_path / "ws"),
                             num_rays=64, use_checkpoint="scratch",
                             rand_pose=1, clip_text="a sphere",
                             iters=100, bg_train="white")
        loss_fn = make_clip_loss_fn(
            path, np.random.default_rng(2).normal(size=16), num_heads=4)
        tr = Trainer(cfg, rcfg, opt, clip_loss_fn=loss_fn)
        tr.train(ds, max_epochs=1, steps_per_epoch=4)
        assert tr.global_step == 4
