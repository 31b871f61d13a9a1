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


def test_eval_table_dtype_bf16_matches_fp32(scene_dir, cfg, tmp_path):
    """eval_table_dtype=bfloat16 must render within quantization tolerance
    of fp32 (the converged-checkpoint A/B measured -0.0003 dB; here the
    plumbing is checked: cast applied, cache keyed on params version)."""
    val_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "val")
    tr = make_trainer(cfg, str(tmp_path / "ws"))
    tr.state = tr._init_state(1)
    img32, _ = tr.render_full(tr.state.params, val_ds.poses[0],
                              val_ds.intrinsics, val_ds.H, val_ds.W)
    tr.opt.eval_table_dtype = "bfloat16"
    img16, _ = tr.render_full(tr.state.params, val_ds.poses[0],
                              val_ds.intrinsics, val_ds.H, val_ds.W)
    assert tr._table_cast_cache is not None
    assert tr._table_cast_cache[1]["encoder"][0].dtype.name == "bfloat16"
    np.testing.assert_allclose(np.asarray(img16), np.asarray(img32),
                               atol=0.05)
    # cache invalidates when params change
    new_params = dict(tr.state.params)
    tr.render_full(new_params, val_ds.poses[0], val_ds.intrinsics,
                   val_ds.H, val_ds.W)
    assert tr._table_cast_cache[0] is new_params


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


def test_reset_before_training_keeps_error_map_sizing(scene_dir, cfg,
                                                      tmp_path):
    """A reset_model before the first train step must not pin error_maps to
    a placeholder image count: train() still sizes state from the dataset."""
    train_ds = NeRFDataset(
        DatasetOptions(path=scene_dir, scale=1.0, error_map=True), "train"
    )
    tr = make_trainer(cfg, str(tmp_path / "ws_reset"), error_map=True)
    tr.reset_model()  # state is None here — must stay deferred
    assert tr.state is None
    tr.train(train_ds, max_epochs=1, steps_per_epoch=5)
    assert np.asarray(tr.state.error_maps).shape == (8, 128 * 128)


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


def test_occ_freeze_after_stops_maintenance(scene_dir, cfg, tmp_path):
    """occ_freeze_after halts occupancy updates past the threshold step while
    training continues (late-drift diagnostic knob; benchmarks/drift_probe.py)."""
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.ops.marching import MarchConfig

    train_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "train")
    rcfg = RenderConfig(num_steps=48, upsample_steps=0, min_near=0.05,
                        max_ray_batch=1600)
    opt = TrainerOptions(
        name="gridfrz", workspace=str(tmp_path / "wsf"), lr=1e-2, iters=1000,
        num_rays=512, bg_train="white", use_checkpoint="scratch",
        update_extra_interval=8, occ_freeze_after=16,
    )
    occ_cfg = OccupancyConfig(bound=1.0, grid_size=32, update_chunk=8192,
                              density_thresh=2.0, min_near=0.05)
    mcfg = MarchConfig(bound=1.0, grid_size=32, max_steps=256,
                       samples_per_ray=32, min_near=0.05)
    tr = Trainer(cfg, rcfg, opt, occupancy_cfg=occ_cfg, march_cfg=mcfg)
    tr.train(train_ds, max_epochs=1, steps_per_epoch=20)
    snap = np.asarray(tr.state.occupancy["density_grid"]).copy()
    tr.train(train_ds, max_epochs=1, steps_per_epoch=24)
    assert np.array_equal(snap, np.asarray(tr.state.occupancy["density_grid"]))


def test_scan_steps_matches_per_step(scene_dir, cfg, tmp_path):
    """The fused lax.scan train step (TrainerOptions.scan_steps) must produce
    bit-identical params to running the per-step program sequentially with
    the same (idx, key) sequence."""
    import jax
    import jax.numpy as jnp

    train_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "train")
    arrays = train_ds.as_arrays()
    H, W = train_ds.H, train_ds.W
    C = arrays["images"].shape[-1]

    tr = make_trainer(cfg, str(tmp_path / "ws_scan"))
    tr.state = tr._init_state(len(train_ds))

    def copy_state(st):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), st)

    # the step programs donate their input state: run each arm on its own copy
    state_a = copy_state(tr.state)
    state_b = copy_state(tr.state)

    key = jax.random.PRNGKey(7)
    keys = jax.random.split(key, 3)
    idxs = jnp.asarray([0, 3, 1], jnp.int32)

    step1 = tr._build_train_step(H, W, C)
    st = state_a
    for i in range(3):
        st, loss = step1(st, arrays, idxs[i], keys[i])
    ref_params = st.params

    stepk = tr._build_train_step(H, W, C, scan_steps=3)
    st2, losses = stepk(state_b, arrays, idxs, keys)
    assert losses.shape == (3,)
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(st2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(st2.global_step) == 3


@pytest.mark.slow  # compile-dominated (~60s: scan-wrapped step + per-step +
# occupancy programs); scan_steps is a default-off option (lost its chip A/B,
# RESULTS.md round-4 queue 1) and the bit-parity core is covered fast by
# test_scan_steps_matches_per_step
def test_scan_steps_train_loop_boundaries(scene_dir, cfg, tmp_path):
    """Trainer.train with scan_steps on the grid fast path: chunks never
    cross the occupancy cadence, the step count is exact, and training
    still learns."""
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.ops.marching import MarchConfig

    train_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "train")
    rcfg = RenderConfig(num_steps=48, upsample_steps=0, min_near=0.05,
                        max_ray_batch=1600)
    opt = TrainerOptions(
        name="scan", workspace=str(tmp_path / "ws_scanloop"), lr=1e-2,
        iters=1000, num_rays=512, bg_train="white", use_checkpoint="scratch",
        update_extra_interval=4, scan_steps=4,
    )
    occ_cfg = OccupancyConfig(bound=1.0, grid_size=32, update_chunk=8192,
                              density_thresh=2.0, min_near=0.05)
    mcfg = MarchConfig(bound=1.0, grid_size=32, max_steps=256,
                       samples_per_ray=32, min_near=0.05)
    tr = Trainer(cfg, rcfg, opt, occupancy_cfg=occ_cfg, march_cfg=mcfg)
    # 10 is not a multiple of 4: exercises the steps-remaining clip
    tr.train(train_ds, max_epochs=2, steps_per_epoch=10)
    assert tr.global_step == 20
    assert int(tr.state.global_step) == 20
    assert tr.stats["loss"][-1] < tr.stats["loss"][0]
    # occupancy maintenance ran (cadence boundaries were hit exactly)
    assert getattr(tr, "_occ_version", 0) > 1


def test_test_renders_frames(scene_dir, cfg, tmp_path):
    val_ds = NeRFDataset(DatasetOptions(path=scene_dir, scale=1.0), "val")
    tr = make_trainer(cfg, str(tmp_path / "ws4"))
    tr.state = tr._init_state(1)
    frames = tr.test(val_ds, write_video=False)
    assert len(frames) == 1
    assert frames[0].shape == (40, 40, 3)
    assert os.path.exists(os.path.join(tr.workspace, "results", "test_0000.png"))


def test_checkpoint_partial_template_by_path(tmp_path):
    """Path-keyed leaves: a PARTIAL template (ema_params + occupancy) picks
    the right arrays by name even though the file holds a larger tree —
    positional matching would silently read same-shaped wrong leaves
    (simulate.py loads exactly this way)."""
    import jax.numpy as jnp

    from nerfnav_tpu.training import checkpoint as ckpt_lib

    params = {"w": jnp.arange(4.0), "b": jnp.ones(2)}
    ema = {"w": jnp.arange(4.0) * 10, "b": jnp.full(2, 7.0)}
    occ = {"bitfield": jnp.arange(8, dtype=jnp.uint8)}
    tree = {"params": params, "ema_params": ema, "opt_state": (jnp.zeros(4),),
            "occupancy": occ}
    p = str(tmp_path / "ck")
    ckpt_lib.save_checkpoint(p, tree, {"epoch": 3})

    tmpl = {"ema_params": {"w": jnp.zeros(4), "b": jnp.zeros(2)},
            "occupancy": {"bitfield": jnp.zeros(8, jnp.uint8)}}
    got, meta, report = ckpt_lib.load_checkpoint(p, tmpl)
    assert meta["epoch"] == 3 and not report
    np.testing.assert_array_equal(np.asarray(got["ema_params"]["w"]),
                                  np.arange(4.0) * 10)
    np.testing.assert_array_equal(np.asarray(got["occupancy"]["bitfield"]),
                                  np.arange(8))
    # missing keys are reported, template kept
    tmpl2 = {"ema_params": {"w": jnp.zeros(4), "extra": jnp.zeros(3)}}
    got2, _, report2 = ckpt_lib.load_checkpoint(p, tmpl2)
    assert len(report2) == 1 and "extra" in report2[0]
    np.testing.assert_array_equal(np.asarray(got2["ema_params"]["extra"]),
                                  np.zeros(3))


def test_checkpoint_legacy_positional_format(tmp_path):
    """Files written by the old positional writer still load."""
    import json

    import jax
    import jax.numpy as jnp

    from nerfnav_tpu.training import checkpoint as ckpt_lib

    tree = {"a": jnp.arange(3.0), "b": jnp.ones((2, 2))}
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"treedef": str(treedef), "meta": {"v": 1}}).encode(),
        dtype=np.uint8)
    p = str(tmp_path / "legacy.npz")
    np.savez(p, **arrays)
    got, meta, report = ckpt_lib.load_checkpoint(p, jax.tree_util.tree_map(
        jnp.zeros_like, tree))
    assert meta["v"] == 1 and not report
    np.testing.assert_array_equal(np.asarray(got["a"]), np.arange(3.0))


class TestPoselessClipMode:
    """rand_pose/clip wiring (reference utils.py:381-424, provider.py:282-296)
    driven end-to-end with an injected jax-differentiable stub scorer."""

    def test_trains_with_stub_loss(self, tmp_path):
        import jax.numpy as jnp

        from nerfnav_tpu.data import NeRFDataset
        from nerfnav_tpu.data.provider import DatasetOptions
        from nerfnav_tpu.data.synthetic import make_synthetic_scene
        from nerfnav_tpu.models import NetworkConfig, RenderConfig
        from nerfnav_tpu.training import Trainer, TrainerOptions

        scene = str(tmp_path / "scene")
        make_synthetic_scene(scene, n_train=3, n_val=1, H=24, W=24,
                             num_steps=24)
        ds = NeRFDataset(DatasetOptions(path=scene, scale=1.0), "train")

        calls = []

        def stub_clip_loss(image):
            calls.append(1)
            # "text prompt: a dark scene" — differentiable, drives brightness
            return jnp.mean(image)

        cfg = NetworkConfig(bound=1.0, grid_levels=2,
                            grid_log2_hashmap_size=8, grid_max_resolution=16)
        rcfg = RenderConfig(num_steps=16, upsample_steps=0, min_near=0.05)
        opt = TrainerOptions(
            name="clip", workspace=str(tmp_path / "ws"), lr=1e-2,
            num_rays=64, use_checkpoint="scratch", rand_pose=2,
            clip_text="a dark scene",
        )
        tr = Trainer(cfg, rcfg, opt, clip_loss_fn=stub_clip_loss)
        tr.train(ds, max_epochs=1, steps_per_epoch=6)
        # steps 2 and 5 are similarity batches (one per rand_pose=2
        # supervised); the stub traced at least once (jit caches repeats)
        assert calls, "clip loss was never invoked"
        assert tr.global_step == 6

    def test_missing_scorer_fails_loudly(self, tmp_path):
        import pytest

        from nerfnav_tpu.models import NetworkConfig, RenderConfig
        from nerfnav_tpu.training import Trainer, TrainerOptions

        opt = TrainerOptions(name="clip", workspace=str(tmp_path / "ws"),
                             rand_pose=0, clip_text="x")
        with pytest.raises(RuntimeError, match="clip_loss_fn"):
            Trainer(NetworkConfig(), RenderConfig(), opt)
