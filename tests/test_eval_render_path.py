"""Productized eval/test/GUI render path (round-3 VERDICT item 1).

The Trainer's render_full must run the BENCH-adopted configuration by
default — occupancy-derived phase-A ladder plan (plan_occupied_ladder,
+33% chip A/B), whole-frame scan dispatch (+17%), bf16 eval tables (+17%),
and the render-only march trims (seg12/anch2) — with the plan cached per
occupancy version and invalidated on every occupancy update.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfnav_tpu.models import NetworkConfig, RenderConfig
from nerfnav_tpu.models.occupancy import OccupancyConfig
from nerfnav_tpu.ops.marching import MarchConfig
from nerfnav_tpu.ops.morton import pack_blocks, packbits
from nerfnav_tpu.training import Trainer, TrainerOptions


def _ball_occupancy(trainer, radius=0.5):
    """Replace the trainer's occupancy with a synthetic occupied ball."""
    mcfg = trainer.march_cfg
    H = mcfg.grid_size
    ii = np.arange(H**3)
    c = (np.stack([ii // (H * H), (ii // H) % H, ii % H], -1) + 0.5) / H * 2 - 1
    occ = jnp.asarray((np.linalg.norm(c, axis=-1) < radius)[None])
    f = mcfg.coarse_factor
    hc = H // f
    occ_c = jnp.asarray(
        np.asarray(occ).reshape(1, hc, f, hc, f, hc, f)
        .max(axis=(2, 4, 6)).reshape(1, -1))
    st = dict(trainer.state.occupancy)
    st["bitfield"] = packbits(occ.astype(jnp.float32))
    st["bitfield_coarse"] = packbits(occ_c.astype(jnp.float32))
    st["blocks"] = pack_blocks(occ, H)
    st["blocks_coarse"] = pack_blocks(occ_c, hc, block=8 if hc % 8 == 0 else 4)
    trainer.state = trainer.state._replace(occupancy=st)
    trainer._occ_version += 1


@pytest.fixture()
def grid_trainer(tmp_path):
    cfg = NetworkConfig(bound=1.0, grid_levels=4, grid_log2_hashmap_size=10,
                        grid_max_resolution=32, grid_layout="cell",
                        grid_level_dim=8)
    rcfg = RenderConfig(num_steps=16, upsample_steps=0, min_near=0.05,
                        max_ray_batch=256)
    opt = TrainerOptions(name="evalpath", workspace=str(tmp_path),
                         use_checkpoint="scratch")
    occ_cfg = OccupancyConfig(bound=1.0, grid_size=16, update_chunk=512)
    mcfg = MarchConfig(bound=1.0, grid_size=16, max_steps=64,
                       samples_per_ray=8, min_near=0.05)
    tr = Trainer(cfg, rcfg, opt, occupancy_cfg=occ_cfg, march_cfg=mcfg)
    tr.state = tr._init_state(1)
    _ball_occupancy(tr)
    return tr


POSE = np.eye(4, dtype=np.float32)
POSE[2, 3] = -1.5
INTR = np.asarray([20.0, 20.0, 8.0, 8.0], np.float32)


class TestDefaults:
    def test_bench_adopted_defaults(self):
        """The product path defaults ARE the bench-adopted configuration."""
        opt = TrainerOptions()
        assert opt.eval_scan
        assert opt.eval_occ_ladder
        assert opt.eval_table_dtype == "bfloat16"
        assert opt.eval_rounds
        assert opt.eval_coarse_segments == 12
        assert opt.eval_coarse_anchors == 2

    def test_eval_march_cfg_trims(self, grid_trainer):
        m = grid_trainer._eval_march_cfg()
        assert m.coarse_segments == 12 and m.coarse_anchors == 2
        # training march untouched
        assert grid_trainer.march_cfg.coarse_segments == 16

    def test_cli_defaults_match(self):
        from nerfnav_tpu.cli.flags import build_parser

        opt = build_parser("t").parse_args(["scene"])
        assert opt.eval_scan and opt.eval_occ_ladder
        assert opt.eval_table_dtype == "bfloat16"


class TestFrozenRender:
    def test_frozen_matches_args_path(self, grid_trainer):
        """render_full(frozen=True) bakes params/occupancy as program
        constants (chip +60% over the traced-args program) — outputs must
        match the args path, and the baked program must be cached per
        (occ version, params identity)."""
        tr = grid_trainer
        p = tr.state.params
        img_a, dep_a = tr.render_full(p, POSE, INTR, 16, 16)
        img_f, dep_f = tr.render_full(p, POSE, INTR, 16, 16, frozen=True)
        np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_a),
                                   atol=2e-5)
        cached = tr._frozen_scan_cache
        assert cached is not None
        tr.render_full(p, POSE, INTR, 16, 16, frozen=True)
        assert tr._frozen_scan_cache is cached   # same key: program reused
        # occupancy update invalidates the key
        _ball_occupancy(tr, radius=0.4)
        tr.render_full(p, POSE, INTR, 16, 16, frozen=True)
        assert tr._frozen_scan_cache is not cached


class TestOccLadderPlan:
    def test_plan_cached_per_version(self, grid_trainer):
        tr = grid_trainer
        img, _ = tr.render_full(tr.state.params, POSE, INTR, 16, 16)
        assert np.isfinite(np.asarray(img)).all()
        ver, t_a0 = tr._ladder_plan
        assert t_a0 > 0
        # same version: plan object reused (no replan)
        sentinel = (ver, t_a0)
        tr._ladder_plan = sentinel
        tr.render_full(tr.state.params, POSE, INTR, 16, 16)
        assert tr._ladder_plan is sentinel

    def test_plan_invalidated_on_occupancy_update(self, grid_trainer):
        tr = grid_trainer
        tr.render_full(tr.state.params, POSE, INTR, 16, 16)
        v0 = tr._ladder_plan[0]
        # an occupancy replace (what _maybe_update_occupancy does) bumps the
        # version; the next render must replan
        _ball_occupancy(tr, radius=0.3)
        tr.render_full(tr.state.params, POSE, INTR, 16, 16)
        assert tr._ladder_plan[0] > v0

    def test_ladder_on_off_close(self, grid_trainer):
        tr = grid_trainer
        img_on, _ = tr.render_full(tr.state.params, POSE, INTR, 16, 16)
        tr.opt.eval_occ_ladder = False
        tr.invalidate_render_cache()
        img_off, _ = tr.render_full(tr.state.params, POSE, INTR, 16, 16)
        # the plan changes per-ray phase-A step slightly (dt_a clip) but the
        # rendered scene must agree closely
        diff = np.abs(np.asarray(img_on) - np.asarray(img_off))
        assert diff.mean() < 0.02, diff.mean()

    def test_empty_occupancy_plans_zero(self, grid_trainer):
        tr = grid_trainer
        st = {k: (jnp.zeros_like(v)
                  if k in ("bitfield", "bitfield_coarse", "blocks",
                           "blocks_coarse") else v)
              for k, v in tr.state.occupancy.items()}
        tr.state = tr.state._replace(occupancy=st)
        tr._occ_version += 1
        img, _ = tr.render_full(tr.state.params, POSE, INTR, 16, 16)
        assert tr._ladder_plan[1] == 0
        # empty scene renders pure background
        np.testing.assert_allclose(np.asarray(img), 1.0, atol=1e-5)

    def test_gamma_plan_is_span_float(self, grid_trainer):
        """dt_gamma > 0: the planner returns a float gamma_span bound (the
        round-4 gamma analogue of the t_a0 plan) and render_full agrees
        closely with the unplanned full-span ladder."""
        import dataclasses

        tr = grid_trainer
        _ball_occupancy(tr, radius=0.3)  # strict subset: a shrink exists
        tr.march_cfg = dataclasses.replace(tr.march_cfg, dt_gamma=1 / 64)
        tr.invalidate_render_cache()
        img_on, _ = tr.render_full(tr.state.params, POSE, INTR, 16, 16)
        plan = tr._ladder_plan[1]
        assert isinstance(plan, float) and plan > 0.0
        full = 2.0 * np.sqrt(3.0) * tr.march_cfg.bound
        assert plan < full
        tr.opt.eval_occ_ladder = False
        tr.invalidate_render_cache()
        img_off, _ = tr.render_full(tr.state.params, POSE, INTR, 16, 16)
        # identical sample set by construction (exactness bound); allow fp
        # noise from the recompiled program
        diff = np.abs(np.asarray(img_on) - np.asarray(img_off))
        assert diff.max() < 1e-5, diff.max()
        tr.opt.eval_occ_ladder = True

    def test_explicit_gamma_span_override_wins(self, grid_trainer):
        import dataclasses

        tr = grid_trainer
        tr.march_cfg = dataclasses.replace(tr.march_cfg, dt_gamma=1 / 64,
                                           gamma_span=2.0)
        tr.invalidate_render_cache()
        tr.render_full(tr.state.params, POSE, INTR, 16, 16)
        assert tr._ladder_plan is None

    def test_explicit_t_a0_override_wins(self, grid_trainer, tmp_path):
        import dataclasses

        tr = grid_trainer
        tr.march_cfg = dataclasses.replace(tr.march_cfg, t_a0_steps=24)
        tr.invalidate_render_cache()
        tr.render_full(tr.state.params, POSE, INTR, 16, 16)
        # an explicit override disables planning entirely
        assert tr._ladder_plan is None

    def test_invalidate_render_cache_drops_programs(self, grid_trainer):
        tr = grid_trainer
        tr.render_full(tr.state.params, POSE, INTR, 16, 16)
        assert tr._render_chunk_fns and tr._render_scan_fns
        tr.invalidate_render_cache()
        assert not tr._render_chunk_fns and not tr._render_scan_fns
        assert tr._ladder_plan is None and tr._table_cast_cache is None


class TestEvalBeam:
    def test_auto_beam_rule(self, grid_trainer):
        """eval_beam=0 derives the width from the frame's focal: flagship
        800^2/f800 -> 8; the toy 16^2/f20 frame -> 2; a pinhole too wide
        for the 1-coarse-cell contract -> 1 (off)."""
        import dataclasses

        from nerfnav_tpu.ops.marching import MarchConfig

        tr = grid_trainer
        # flagship geometry: grid 128 / cf 4 -> hc 32, bound 2
        tr.march_cfg, saved = MarchConfig(bound=2.0, grid_size=128,
                                          min_near=0.05), tr.march_cfg
        assert tr._auto_beam(np.asarray([800.0, 800.0, 400, 400])) == 8
        assert tr._auto_beam(np.asarray([64.0, 64.0, 32, 32])) == 1
        tr.march_cfg = saved
        assert tr._auto_beam(np.asarray(INTR)) == 2

    def test_eval_beam_matches_default(self, grid_trainer):
        """TrainerOptions.eval_beam routes MarchConfig.beam into the eval
        march only: render_full output must match the beam=1 path closely
        (the tile-ordered eval chunks keep members pixel-adjacent; residual
        diff is silhouette lattice phase — see tests/test_beam_march.py)."""
        import dataclasses

        tr = grid_trainer
        p = tr.state.params
        tr.opt = dataclasses.replace(tr.opt, eval_beam=1)   # explicit OFF
        img1, _ = tr.render_full(p, POSE, INTR, 16, 16, bg_color=1.0)
        tr.opt = dataclasses.replace(tr.opt, eval_beam=8)
        tr.invalidate_render_cache()
        # eval_beam is NOT baked into the base eval march config (it also
        # feeds the sequence renderer and the untiled path, where the
        # pixel-adjacency contract fails — advisor round 4); render_full
        # injects it per tile-ordered call instead
        assert tr._eval_march_cfg().beam == 1
        assert tr.march_cfg.beam == 1      # the TRAIN march stays unbeamed
        img8, _ = tr.render_full(p, POSE, INTR, 16, 16, bg_color=1.0)
        mse = float(jnp.mean((img1 - img8) ** 2))
        psnr = -10.0 * np.log10(mse + 1e-12)
        # the toy scale amplifies the lattice-phase shift: grid 16 / K 8
        # puts the coarse step at ~0.43 against a 0.5-radius ball, so the
        # beam-near anchor moves samples a large fraction of the geometry
        # (beam=4 and beam=8 measure the SAME ~32 dB — it is the anchor
        # shift, not beam width). Finer-scale parity (grid 32: 40+ dB) is
        # pinned in tests/test_beam_march.py::test_render_parity.
        assert psnr > 30.0, psnr


class TestBeamRowClamp:
    def test_clamp_beam_to_rows(self):
        """Beams may not straddle tile-row boundaries: full rows are 64 px,
        right-edge tiles W % 64 px (advisor round 4 — W=820 edge rows are
        52 px, where beam 8 silently spans ~32+ px)."""
        from nerfnav_tpu.training.trainer import Trainer

        c = Trainer._clamp_beam_to_rows
        assert c(8, 800) == 8          # 800 % 64 = 32: 32 % 8 == 0
        assert c(8, 820) == 4          # edge 52: 52 % 8 != 0, 52 % 4 == 0
        assert c(8, 640) == 8          # no edge tiles
        assert c(16, 840) == 8         # edge 8
        assert c(8, 65) == 1           # 1-px edge rows: beam off
        assert c(1, 820) == 1


class TestBeamDilateCache:
    def test_dilated_table_cached_per_occ_version(self, grid_trainer):
        """_beamed_occupancy builds the dilated coarse table once per
        occupancy version (the per-chunk in-march rebuild dominated the
        beamed phase A on chip, round 5)."""
        tr = grid_trainer
        occ = tr.state.occupancy
        o1 = tr._beamed_occupancy(occ)
        assert "blocks_coarse_dilated" in o1
        o2 = tr._beamed_occupancy(occ)
        assert o2["blocks_coarse_dilated"] is o1["blocks_coarse_dilated"]
        # version bump -> rebuilt
        _ball_occupancy(tr, radius=0.3)
        o3 = tr._beamed_occupancy(tr.state.occupancy)
        assert o3["blocks_coarse_dilated"] is not o1["blocks_coarse_dilated"]
        # and the dilated table is a superset of the raw coarse bits
        from nerfnav_tpu.ops.morton import unpack_blocks

        hc = tr.march_cfg.grid_size // tr.march_cfg.coarse_factor
        raw = np.asarray(unpack_blocks(tr.state.occupancy["blocks_coarse"],
                                       hc))
        dil = np.asarray(unpack_blocks(o3["blocks_coarse_dilated"], hc))
        assert (dil >= raw).all() and dil.sum() > raw.sum()


class TestFramePhaseA:
    def test_scan_split_matches_fused(self, grid_trainer):
        """eval_frame_phase_a routes the scan renderer through ONE
        frame-wide phase A + per-chunk phase B; output must match the
        fused per-chunk march exactly."""
        import dataclasses

        tr = grid_trainer
        p = tr.state.params
        img_f, dep_f = tr.render_full(p, POSE, INTR, 16, 16)
        tr.opt = dataclasses.replace(tr.opt, eval_frame_phase_a=True)
        tr.invalidate_render_cache()
        img_s, dep_s = tr.render_full(p, POSE, INTR, 16, 16)
        np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_f),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(dep_s), np.asarray(dep_f),
                                   atol=1e-5)
