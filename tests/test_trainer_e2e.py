"""End-to-end: synthetic scene -> Trainer -> PSNR improves -> checkpoints
round-trip. The synthetic-scene PSNR smoke test SURVEY.md 4 calls for."""

import os

import numpy as np
import pytest

from nerfnav_tpu.data import NeRFDataset
from nerfnav_tpu.data.provider import DatasetOptions
from nerfnav_tpu.data.synthetic import make_synthetic_scene
from nerfnav_tpu.models import NetworkConfig, RenderConfig
from nerfnav_tpu.training import Trainer, TrainerOptions


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e_scene")
    make_synthetic_scene(str(d), n_train=8, n_val=1, H=40, W=40, num_steps=64)
    return str(d)


@pytest.fixture(scope="module")
def cfg():
    return NetworkConfig(bound=1.0, grid_levels=6, grid_log2_hashmap_size=13,
                         grid_max_resolution=128)


def make_trainer(cfg, workspace, **kw):
    rcfg = RenderConfig(num_steps=48, upsample_steps=0, min_near=0.05,
                        max_ray_batch=1600)
    opt = TrainerOptions(
        name="test", workspace=workspace, lr=1e-2, iters=1000, num_rays=512,
        eval_interval=1, bg_train="white", use_checkpoint="scratch", **kw,
    )
    return Trainer(cfg, rcfg, opt)


def test_training_improves_psnr(scene_dir, cfg, tmp_path):
    train_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "train")
    val_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "val")
    tr = make_trainer(cfg, str(tmp_path / "ws"))

    tr.state = tr._init_state(len(train_ds))
    psnr_before = tr.evaluate(val_ds, use_ema=False)

    tr.train(train_ds, valid_ds=None, max_epochs=3, steps_per_epoch=100)
    psnr_val = tr.evaluate(val_ds, use_ema=False)
    # train-split reconstruction is the correctness signal (novel-view PSNR
    # with 8 random sparse orbit views is generalization-limited, not a bug)
    psnr_train = tr.evaluate(train_ds, use_ema=False)

    assert psnr_val > psnr_before + 4, (psnr_before, psnr_val)
    assert psnr_train > 23, psnr_train
    # loss history recorded
    assert len(tr.stats["loss"]) == 3
    assert tr.stats["loss"][-1] < tr.stats["loss"][0]


def test_checkpoint_resume(scene_dir, cfg, tmp_path):
    ws = str(tmp_path / "ws2")
    train_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "train")
    tr = make_trainer(cfg, ws)
    tr.train(train_ds, max_epochs=1, steps_per_epoch=20)
    step0, epoch0 = tr.global_step, tr.epoch
    params0 = tr.state.params

    # new trainer resumes from latest
    tr2 = make_trainer(cfg, ws)
    tr2.opt.use_checkpoint = "latest"
    tr2.state = tr2._init_state(len(train_ds))
    tr2._maybe_resume()
    assert tr2.epoch == epoch0
    assert tr2.global_step == step0
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(params0), jax.tree_util.tree_leaves(tr2.state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_error_map_mode_runs(scene_dir, cfg, tmp_path):
    train_ds = NeRFDataset(
        DatasetOptions(path=scene_dir, scale=1.0, error_map=True), "train"
    )
    tr = make_trainer(cfg, str(tmp_path / "ws3"), error_map=True)
    tr.train(train_ds, max_epochs=1, steps_per_epoch=10)
    em = np.asarray(tr.state.error_maps)
    assert em.shape == (8, 128 * 128)
    assert not np.allclose(em, 0.1)  # got updated


def test_grid_fast_path_training(scene_dir, cfg, tmp_path):
    """Occupancy-grid accelerated training (the reference -O mode) end-to-end:
    grid updates every 16 steps, marching + static-budget rendering, PSNR
    improves on the train split."""
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.ops.marching import MarchConfig

    train_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "train")
    rcfg = RenderConfig(num_steps=48, upsample_steps=0, min_near=0.05,
                        max_ray_batch=1600)
    opt = TrainerOptions(
        name="grid", workspace=str(tmp_path / "wsg"), lr=1e-2, iters=1000,
        num_rays=512, bg_train="white", use_checkpoint="scratch",
        update_extra_interval=16,
    )
    occ_cfg = OccupancyConfig(bound=1.0, grid_size=32, update_chunk=8192,
                              density_thresh=2.0, min_near=0.05)
    mcfg = MarchConfig(bound=1.0, grid_size=32, max_steps=256,
                       samples_per_ray=32, min_near=0.05)
    tr = Trainer(cfg, rcfg, opt, occupancy_cfg=occ_cfg, march_cfg=mcfg)
    tr.train(train_ds, max_epochs=2, steps_per_epoch=100)
    psnr_train = tr.evaluate(train_ds, use_ema=False)
    assert psnr_train > 20, psnr_train
    # the occupancy grid learned something: some cells on, most off
    import numpy as np

    bits = np.asarray(tr.state.occupancy["bitfield"])
    frac = np.unpackbits(bits).mean()
    assert 0.001 < frac < 0.9, frac


def test_test_renders_frames(scene_dir, cfg, tmp_path):
    val_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "val")
    tr = make_trainer(cfg, str(tmp_path / "ws4"))
    tr.state = tr._init_state(1)
    frames = tr.test(val_ds, write_video=False)
    assert len(frames) == 1
    assert frames[0].shape == (40, 40, 3)
    assert os.path.exists(os.path.join(tr.workspace, "results", "test_0000.png"))
