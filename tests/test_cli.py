"""CLI smoke tests: flag wiring through the real entry points (tiny scale)."""

import os

import pytest

from nerfnav_tpu.data.synthetic import make_synthetic_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_scene")
    make_synthetic_scene(str(d), n_train=3, n_val=1, H=32, W=32, num_steps=48)
    return str(d)


def test_main_nerf_train_and_test(scene_dir, tmp_path):
    from nerfnav_tpu.cli.main_nerf import main

    ws = str(tmp_path / "ws")
    args = [
        scene_dir, "--workspace", ws, "--scale", "1.0", "--bound", "1.0",
        "--iters", "30", "--num_rays", "64", "--num_steps", "24",
        "--upsample_steps", "0", "--min_near", "0.05", "--ckpt", "scratch",
        "--max_ray_batch", "512",
    ]
    main(args)
    assert os.path.exists(os.path.join(ws, "checkpoints"))
    assert any(f.endswith(".npz") for f in os.listdir(os.path.join(ws, "checkpoints")))
    # test mode resumes from the checkpoint and renders the val split
    main(args[:9] + ["--upsample_steps", "0", "--min_near", "0.05",
                     "--ckpt", "latest", "--max_ray_batch", "512", "--test"])
    assert os.path.exists(os.path.join(ws, "results"))


@pytest.mark.slow
def test_simulate_analytic(tmp_path):
    from nerfnav_tpu.cli.simulate import main

    ws = str(tmp_path / "sim_ws")
    history = main([
        ".", "--analytic", "--workspace", ws, "--steps", "4",
        "--open_loop_steps", "2", "--obs_res", "48", "--obs_focal", "48",
        "--epochs_init", "60", "--epochs_update", "15",
        "--estimator_iters", "8", "--estimator_batch", "128",
        "--start", "-0.7", "0.0", "0.1", "--goal", "0.7", "0.2", "0.1",
        "--bound", "1.0", "--scale", "1.0",
    ])
    assert len(history) == 4
    assert os.path.exists(os.path.join(ws, "estimator_data"))


@pytest.mark.slow
def test_simulate_grid_filter_from_trained_ckpt(scene_dir, tmp_path):
    """Train with the occupancy fast path, then run the nav loop with the
    pose filter rendering through the grid path (--filter_render grid):
    the full checkpoint's EMA params + occupancy state are recovered by
    name (path-keyed checkpoint), no fallback warning path taken."""
    from nerfnav_tpu.cli.main_nerf import main as train_main
    from nerfnav_tpu.cli.simulate import main as sim_main

    ws = str(tmp_path / "ws")
    train_main([
        scene_dir, "--workspace", ws, "--scale", "1.0", "--bound", "1.0",
        "--iters", "40", "--num_rays", "64", "--num_steps", "24",
        "--upsample_steps", "0", "--min_near", "0.05", "--ckpt", "scratch",
        "--max_ray_batch", "512", "--cuda_ray", "--grid_size", "16",
        "--max_steps", "64", "--samples_per_ray", "16",
        "--update_extra_interval", "8",
    ])
    history = sim_main([
        scene_dir, "--workspace", ws, "--steps", "3", "--open_loop_steps", "1",
        "--obs_res", "40", "--obs_focal", "40", "--epochs_init", "40",
        "--epochs_update", "10", "--estimator_iters", "6",
        "--estimator_batch", "128", "--start", "-0.7", "0.0", "0.1",
        "--goal", "0.7", "0.2", "0.1", "--bound", "1.0", "--scale", "1.0",
        "--ckpt", "latest", "--filter_render", "grid", "--grid_size", "16",
        "--max_steps", "64", "--astar_thresh", "1e9",
    ])
    assert len(history) == 3


def test_dt_gamma_resolution_and_warning():
    """-O resolves dt_gamma to 0 (fast marchers); explicit nonzero dt_gamma
    with the grid path warns that it runs the block marcher's longer static
    gamma ladder (round-3: gamma now rides the fast path)."""
    import warnings

    from nerfnav_tpu.cli.flags import build_parser, make_configs

    p = build_parser("t")
    opt = p.parse_args(["scene", "-O"])
    _, _, _, march_cfg = make_configs(opt)
    assert opt.dt_gamma == 0.0 and march_cfg.dt_gamma == 0.0

    opt = p.parse_args(["scene", "--cuda_ray"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        make_configs(opt)
    assert opt.dt_gamma == 1 / 128
    assert any("gamma ladder" in str(x.message) for x in w)


def test_checkpoint_grid_meta_mismatch_raises(scene_dir, tmp_path):
    """Loading a checkpoint trained under a different grid architecture must
    fail loudly, not keep random template params (ADVICE round 1)."""
    from nerfnav_tpu.cli.main_nerf import main

    ws = str(tmp_path / "ws")
    base = [
        scene_dir, "--workspace", ws, "--scale", "1.0", "--bound", "1.0",
        "--iters", "4", "--num_rays", "32", "--num_steps", "16",
        "--min_near", "0.05", "--max_ray_batch", "256",
    ]
    main(base + ["--ckpt", "scratch", "--grid_levels", "2"])
    with pytest.raises(ValueError, match="grid architecture"):
        main(base + ["--ckpt", "latest", "--grid_levels", "4", "--test"])


def test_simulate_defaults_are_the_measured_fused_config():
    """The simulate product default IS the chip-measured 10.9 Hz / 0.7 mm
    configuration (round-5): fused one-program MPC tick, dense filter
    render, orb/ds2 front-end — with --no_fused and --poi_backend sift as
    the reference-parity escapes."""
    from nerfnav_tpu.cli.simulate import build_sim_parser

    p = build_sim_parser()
    opt = p.parse_args(["scene"])
    assert opt.fused_cycle
    assert opt.filter_render == "dense"
    assert opt.poi_backend == "orb" and opt.poi_downscale == 2
    opt = p.parse_args(["scene", "--no_fused", "--poi_backend", "sift",
                        "--poi_downscale", "1"])
    assert not opt.fused_cycle
    assert opt.poi_backend == "sift" and opt.poi_downscale == 1
