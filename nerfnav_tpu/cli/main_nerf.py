"""Training CLI.

Capability parity: reference main_nerf.py — `python -m nerfnav_tpu.cli.main_nerf
<path> -O --bound 2.0 --scale 1.0 ...` trains Instant-NGP on a transforms.json
scene; `--test` evaluates + renders the test path to mp4 (main_nerf.py:104-155).
"""

import sys


def main(argv=None):
    from nerfnav_tpu.cli.flags import build_parser, make_configs
    from nerfnav_tpu.utils.jax_setup import enable_compilation_cache

    # product warm-start (round-5): the persistent executable cache was
    # previously wired into benches/tests only, so every CLI run after a
    # reboot re-paid full compiles (14+ min cold bench, ~29 min fused tick)
    enable_compilation_cache()
    opt = build_parser("nerfnav_tpu NeRF training").parse_args(argv)
    cfg, rcfg, occ_cfg, march_cfg = make_configs(opt, for_nav=False)

    from nerfnav_tpu.data import NeRFDataset
    from nerfnav_tpu.data.provider import DatasetOptions
    from nerfnav_tpu.training import Trainer, TrainerOptions

    ds_opt = DatasetOptions(
        path=opt.path, scale=opt.scale, offset=tuple(opt.offset),
        color_space=opt.color_space, downscale=opt.downscale,
        preload=opt.preload, fp16=opt.fp16, num_rays=opt.num_rays,
        error_map=opt.error_map,
    )
    topt = TrainerOptions(
        name="ngp", workspace=opt.workspace, lr=opt.lr, iters=opt.iters,
        lr_iters=opt.lr_iters,
        num_rays=opt.num_rays, use_checkpoint=opt.ckpt, seed=opt.seed,
        error_map=opt.error_map,
        update_extra_interval=opt.update_extra_interval, tensorboard=True,
        rand_pose=opt.rand_pose, clip_text=opt.clip_text,
        eval_table_dtype=opt.eval_table_dtype,
        eval_scan=opt.eval_scan,
        eval_occ_ladder=opt.eval_occ_ladder,
        eval_frame_phase_a=opt.eval_frame_phase_a,
        stride_phase=opt.stride_phase,
        eval_coarse_segments=opt.eval_coarse_segments,
        eval_coarse_anchors=opt.eval_coarse_anchors,
        eval_first_k=opt.eval_first_k,
        eval_proxy=opt.eval_proxy,
        **({"eval_beam": opt.eval_beam} if opt.eval_beam else {}),
    )
    # Poseless/CLIP mode: with --clip_weights + --clip_text_embed the native
    # JAX vision tower scores renders (training/clip_jax.py); without them
    # the Trainer raises its gated error (weights unfetchable offline).
    clip_loss_fn = None
    if (opt.clip_weights is None) != (opt.clip_text_embed is None):
        raise SystemExit(
            "--clip_weights and --clip_text_embed come as a pair (the "
            ".npy text embedding is precomputed with the text tower; see "
            "training/clip_jax.py)")
    if opt.clip_weights is not None:
        from nerfnav_tpu.training.clip_jax import make_clip_loss_fn

        clip_loss_fn = make_clip_loss_fn(opt.clip_weights, opt.clip_text_embed)
    trainer = Trainer(cfg, rcfg, topt, occupancy_cfg=occ_cfg,
                      march_cfg=march_cfg, clip_loss_fn=clip_loss_fn)

    if opt.test:
        val_ds = NeRFDataset(ds_opt, split="val")
        trainer.state = trainer._init_state(len(val_ds))
        trainer._maybe_resume()
        trainer.evaluate(val_ds, frozen=True)
        try:
            test_ds = NeRFDataset(ds_opt, split="test")
        except FileNotFoundError:
            test_ds = val_ds  # no test split: render the val path instead
        trainer.test(test_ds, write_video=True)
        return

    train_ds = NeRFDataset(ds_opt, split="train")
    val_ds = NeRFDataset(ds_opt, split="val")

    if opt.gui:
        from nerfnav_tpu.gui import NeRFGUI

        gui = NeRFGUI(trainer, train_ds, W=opt.W, H=opt.H, radius=opt.radius,
                      fovy=opt.fovy, max_spp=opt.max_spp)
        gui.serve(port=7860)
        return

    steps_per_epoch = max(len(train_ds), 100)
    max_epochs = max(opt.iters // steps_per_epoch, 1)
    trainer.train(train_ds, valid_ds=val_ds, max_epochs=max_epochs,
                  steps_per_epoch=steps_per_epoch)
    trainer.evaluate(val_ds)


if __name__ == "__main__":
    main(sys.argv[1:])
