"""Data-parallel sharding on the virtual 8-device CPU mesh.

The reference's DDP/NCCL scaffolding (nerf/utils.py:267-268, 305-307,
866-882) maps to `jax.sharding` annotations + implicit XLA SPMD collectives
(SURVEY.md 2.3); these tests pin that behavior without real chips.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerfnav_tpu.parallel import make_mesh, ray_sharding, replicated, shard_rays


def test_make_mesh_and_shardings():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    assert ray_sharding(mesh).spec == jax.sharding.PartitionSpec("data")
    assert replicated(mesh).spec == jax.sharding.PartitionSpec()


def test_sharded_render_matches_single_device():
    """A jitted render over sharded rays must equal the unsharded result —
    the SPMD partitioning is a pure performance annotation."""
    from nerfnav_tpu.data.synthetic import textured_sphere_field
    from nerfnav_tpu.models import RenderConfig, render_rays

    mesh = make_mesh(8)
    field = textured_sphere_field(radius=0.4)
    rcfg = RenderConfig(num_steps=32, upsample_steps=0, min_near=0.05)
    n = 64  # divisible by 8
    rng = np.random.default_rng(0)
    o = jnp.asarray(np.concatenate(
        [rng.uniform(-0.2, 0.2, (n, 2)), np.full((n, 1), -1.5)], -1), jnp.float32)
    d = rng.normal(size=(n, 3))
    d[:, 2] = np.abs(d[:, 2]) + 1.5
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)

    @jax.jit
    def sharded(o, d):
        rays = shard_rays({"o": o, "d": d}, mesh)
        return render_rays(field, rcfg, rays["o"], rays["d"], bg_color=1.0)["image"]

    @jax.jit
    def plain(o, d):
        return render_rays(field, rcfg, o, d, bg_color=1.0)["image"]

    np.testing.assert_allclose(
        np.asarray(sharded(o, d)), np.asarray(plain(o, d)), atol=1e-5
    )


def test_sharded_grad_psum():
    """Gradients of a loss over sharded rays match the unsharded gradients
    (XLA inserts the all-reduce the reference did via NCCL)."""
    mesh = make_mesh(8)
    x = jnp.arange(32.0).reshape(32, 1)

    def loss(w, x):
        xs = shard_rays({"x": x}, mesh)["x"]
        return jnp.mean((xs * w - 1.0) ** 2)

    g_sharded = jax.jit(jax.grad(loss))(2.0, x)
    g_plain = jax.grad(lambda w: jnp.mean((x * w - 1.0) ** 2))(2.0)
    np.testing.assert_allclose(float(g_sharded), float(g_plain), rtol=1e-6)


def test_mesh_eval_render_full_equivalence(tmp_path):
    """Trainer.render_full / occupancy update with a mesh must match the
    meshless result bit-for-bit in structure and closely in value — the
    sharded eval replaces the reference's NCCL eval all_gather
    (utils.py:866-882)."""
    from nerfnav_tpu.models import NetworkConfig, RenderConfig
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.ops.marching import MarchConfig
    from nerfnav_tpu.training import Trainer, TrainerOptions

    cfg = NetworkConfig(bound=1.0, grid_levels=2, grid_log2_hashmap_size=8,
                        grid_max_resolution=16)
    rcfg = RenderConfig(num_steps=16, upsample_steps=0, min_near=0.05,
                        max_ray_batch=256)
    occ = OccupancyConfig(bound=1.0, grid_size=16, update_chunk=512)
    march = MarchConfig(bound=1.0, grid_size=16, max_steps=32,
                        samples_per_ray=8, min_near=0.05)

    outs = {}
    for name, mesh in [("single", None), ("mesh", make_mesh(8))]:
        opt = TrainerOptions(name=name, workspace=str(tmp_path / name),
                             num_rays=64, use_checkpoint="scratch")
        tr = Trainer(cfg, rcfg, opt, occupancy_cfg=occ, march_cfg=march,
                     mesh=mesh)
        tr.state = tr._init_state(1)
        tr._maybe_update_occupancy()  # one sharded/unsharded density sweep
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -1.5
        intr = np.asarray([20.0, 20.0, 8.0, 8.0], np.float32)
        img, depth = tr.render_full(tr.state.params, pose, intr, 16, 16)
        outs[name] = (np.asarray(img), np.asarray(depth),
                      np.asarray(tr.state.occupancy["density_grid"]))

    np.testing.assert_allclose(outs["mesh"][0], outs["single"][0], atol=1e-5)
    np.testing.assert_allclose(outs["mesh"][1], outs["single"][1], atol=1e-5)
    np.testing.assert_allclose(outs["mesh"][2], outs["single"][2], atol=1e-5)


def test_mesh_point_budget_train_step(tmp_path):
    """The packed point-budget train shade must run UNDER a mesh (round-3:
    per-shard packing groups — round 2 disabled the budget on meshes) and
    produce a finite loss with the budgeted program actually selected."""
    from nerfnav_tpu.models import NetworkConfig, RenderConfig
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.ops.marching import MarchConfig
    from nerfnav_tpu.training import Trainer, TrainerOptions

    cfg = NetworkConfig(bound=1.0, grid_levels=2, grid_log2_hashmap_size=8,
                        grid_max_resolution=16)
    rcfg = RenderConfig(num_steps=16, upsample_steps=0, min_near=0.05,
                        max_ray_batch=256)
    occ = OccupancyConfig(bound=1.0, grid_size=16, update_chunk=512)
    march = MarchConfig(bound=1.0, grid_size=16, max_steps=32,
                        samples_per_ray=8, min_near=0.05)
    mesh = make_mesh(8)
    opt = TrainerOptions(name="budget", workspace=str(tmp_path),
                         num_rays=64, use_checkpoint="scratch")
    tr = Trainer(cfg, rcfg, opt, occupancy_cfg=occ, march_cfg=march,
                 mesh=mesh)
    tr.state = tr._init_state(1)
    # pretend the mean-count EMA has settled low enough for the smallest
    # bucket: 0.125 * 64 * 8 = 64 slots -> 8 per shard
    tr._mean_count_host = 40.0
    budget = tr._current_budget()
    assert budget is not None and budget % 8 == 0, budget

    H = W = 16
    images = jnp.asarray(np.random.default_rng(0).random((1, H, W, 3)),
                         jnp.float32)
    poses = jnp.tile(jnp.eye(4)[None], (1, 1, 1)).at[:, 2, 3].set(-1.5)
    arrays = {"poses": poses, "images": images,
              "intrinsics": jnp.asarray([20.0, 20.0, W / 2, H / 2])}
    step = tr._step_fn(H, W, 3)
    state, loss = step(tr.state, arrays, jnp.asarray(0), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_mesh_beamed_render_equivalence(tmp_path):
    """Beamed eval (explicit eval_beam) under the 8-device mesh must match
    the single-device beamed render: shard_rays splits the leading ray
    axis contiguously on chunk boundaries, so beams of consecutive
    tile-ordered rays never straddle a device boundary (512-per-device
    chunks stay divisible by the beam width)."""
    from nerfnav_tpu.models import NetworkConfig, RenderConfig
    from nerfnav_tpu.models.occupancy import OccupancyConfig
    from nerfnav_tpu.ops.marching import MarchConfig
    from nerfnav_tpu.training import Trainer, TrainerOptions

    cfg = NetworkConfig(bound=1.0, grid_levels=2, grid_log2_hashmap_size=8,
                        grid_max_resolution=16)
    rcfg = RenderConfig(num_steps=16, upsample_steps=0, min_near=0.05,
                        max_ray_batch=256)
    occ = OccupancyConfig(bound=1.0, grid_size=16, update_chunk=512)
    march = MarchConfig(bound=1.0, grid_size=16, max_steps=32,
                        samples_per_ray=8, min_near=0.05)
    outs = {}
    for name, mesh in [("single", None), ("mesh", make_mesh(8))]:
        opt = TrainerOptions(name=name, workspace=str(tmp_path / name),
                             num_rays=64, use_checkpoint="scratch",
                             eval_beam=4)
        tr = Trainer(cfg, rcfg, opt, occupancy_cfg=occ, march_cfg=march,
                     mesh=mesh)
        tr.state = tr._init_state(1)
        tr._maybe_update_occupancy()
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -1.5
        intr = np.asarray([64.0, 64.0, 8.0, 8.0], np.float32)  # narrow FOV
        img, _ = tr.render_full(tr.state.params, pose, intr, 16, 16)
        outs[name] = np.asarray(img)
    np.testing.assert_allclose(outs["mesh"], outs["single"], atol=1e-5)
