"""Renderer tests against analytic fields (the reference's latent fake-backend
pattern, quad_plot.py:442-443: developed against closed-form density fields)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfnav_tpu.models import (
    Field,
    RenderConfig,
    render_rays,
    render_image,
    composite,
    sample_pdf,
    near_far_from_aabb,
    aabb_of,
)


def sphere_field(radius=0.5, sigma_inside=200.0, rgb=(1.0, 0.0, 0.0), bound=1.0):
    """Opaque sphere at origin, constant color."""
    rgb = jnp.asarray(rgb)

    def density_fn(x):
        inside = jnp.linalg.norm(x, axis=-1) < radius
        sigma = jnp.where(inside, sigma_inside, 0.0)
        return sigma, jnp.zeros((x.shape[0], 1))

    def color_fn(d, geo):
        return jnp.broadcast_to(rgb, (d.shape[0], 3))

    return Field(density_fn=density_fn, color_fn=color_fn, bound=bound)


class TestNearFar:
    def test_hit_through_origin(self):
        aabb = aabb_of(1.0)
        o = jnp.array([[0.0, 0.0, -2.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        near, far = near_far_from_aabb(o, d, aabb, min_near=0.05)
        np.testing.assert_allclose(float(near[0]), 1.0, rtol=1e-5)
        np.testing.assert_allclose(float(far[0]), 3.0, rtol=1e-5)

    def test_miss(self):
        aabb = aabb_of(1.0)
        o = jnp.array([[0.0, 5.0, -2.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        near, far = near_far_from_aabb(o, d, aabb)
        assert float(far[0]) <= float(near[0]) + 1e-6  # empty segment

    def test_min_near_clamp(self):
        aabb = aabb_of(1.0)
        o = jnp.array([[0.0, 0.0, 0.0]])  # inside the box
        d = jnp.array([[0.0, 0.0, 1.0]])
        near, _ = near_far_from_aabb(o, d, aabb, min_near=0.2)
        np.testing.assert_allclose(float(near[0]), 0.2, rtol=1e-6)


class TestComposite:
    def test_opaque_first_sample(self):
        sigmas = jnp.array([[1e5, 1e5, 1e5]])
        rgbs = jnp.array([[[1.0, 0, 0], [0, 1, 0], [0, 0, 1]]])
        deltas = jnp.full((1, 3), 0.1)
        z = jnp.array([[1.0, 1.1, 1.2]])
        image, depth, ws, w = composite(sigmas, rgbs, deltas, z)
        np.testing.assert_allclose(np.asarray(image[0]), [1, 0, 0], atol=1e-5)
        np.testing.assert_allclose(float(depth[0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(float(ws[0]), 1.0, atol=1e-5)

    def test_empty(self):
        sigmas = jnp.zeros((1, 4))
        rgbs = jnp.ones((1, 4, 3))
        deltas = jnp.full((1, 4), 0.1)
        z = jnp.linspace(1, 2, 4)[None]
        image, depth, ws, _ = composite(sigmas, rgbs, deltas, z)
        np.testing.assert_allclose(float(ws[0]), 0.0, atol=1e-6)

    def test_matches_sequential_reference(self):
        """Vector cumprod form == the per-ray sequential loop the CUDA kernel
        implements (raymarching.cu:506-699)."""
        key = jax.random.PRNGKey(0)
        sigmas = jax.random.uniform(key, (3, 16)) * 20
        rgbs = jax.random.uniform(jax.random.PRNGKey(1), (3, 16, 3))
        deltas = jnp.full((3, 16), 0.05)
        z = jnp.cumsum(deltas, axis=-1) + 1.0
        image, depth, ws, _ = composite(sigmas, rgbs, deltas, z)

        s, r, dl, zz = map(np.asarray, (sigmas, rgbs, deltas, z))
        for ray in range(3):
            T = 1.0
            acc = np.zeros(3)
            dep = 0.0
            wsum = 0.0
            for i in range(16):
                alpha = 1 - np.exp(-s[ray, i] * dl[ray, i])
                wgt = alpha * T
                acc += wgt * r[ray, i]
                dep += wgt * zz[ray, i]
                wsum += wgt
                T *= 1 - alpha
            np.testing.assert_allclose(np.asarray(image[ray]), acc, rtol=1e-4)
            np.testing.assert_allclose(float(ws[ray]), wsum, rtol=1e-4)


class TestSamplePdf:
    def test_concentrates_samples(self):
        bins = jnp.linspace(0, 1, 17)[None]
        weights = jnp.zeros((1, 16)).at[0, 8].set(100.0)
        samples = sample_pdf(bins, weights, 32)
        s = np.asarray(samples[0])
        assert np.mean((s > 0.5) & (s < 0.5625)) > 0.9

    def test_uniform_weights_spread(self):
        bins = jnp.linspace(0, 1, 9)[None]
        weights = jnp.ones((1, 8))
        s = np.asarray(sample_pdf(bins, weights, 64)[0])
        np.testing.assert_allclose(s.mean(), 0.5, atol=0.02)


class TestRenderRays:
    def test_sphere_hit_and_miss(self):
        field = sphere_field()
        rcfg = RenderConfig(num_steps=128, upsample_steps=64, min_near=0.05)
        o = jnp.array([[0.0, 0.0, -1.5], [0.9, 0.9, -1.5]])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        out = render_rays(field, rcfg, o, d, bg_color=0.0)
        img = np.asarray(out["image"])
        # hit: red, depth ~ 1.0 (sphere surface at z=-0.5 from origin z=-1.5)
        np.testing.assert_allclose(img[0], [1, 0, 0], atol=0.02)
        np.testing.assert_allclose(float(out["depth"][0]), 1.0, atol=0.05)
        # miss: background
        np.testing.assert_allclose(img[1], [0, 0, 0], atol=0.02)
        assert float(out["weights_sum"][1]) < 0.01

    def test_white_background(self):
        field = sphere_field()
        rcfg = RenderConfig(num_steps=64, upsample_steps=0, min_near=0.05)
        o = jnp.array([[0.9, 0.9, -1.5]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        out = render_rays(field, rcfg, o, d, bg_color=1.0)
        np.testing.assert_allclose(np.asarray(out["image"][0]), [1, 1, 1], atol=1e-3)

    def test_differentiable_wrt_ray_origin(self):
        """Pose-filter requirement: gradients through rendering into rays
        (estimator_helpers.py:227-241 optimizes a pose through the renderer)."""
        # smooth field so FD is meaningful
        def density_fn(x):
            sigma = 50.0 * jnp.exp(-10.0 * jnp.sum(x * x, axis=-1))
            return sigma, x  # geo_feat = position

        def color_fn(d, geo):
            return jax.nn.sigmoid(geo)

        field = Field(density_fn=density_fn, color_fn=color_fn, bound=1.0)
        rcfg = RenderConfig(num_steps=64, upsample_steps=0, min_near=0.05)
        d = jnp.array([[0.0, 0.0, 1.0]])

        @jax.jit
        def loss(o):
            out = render_rays(field, rcfg, o, d, bg_color=0.0)
            return jnp.sum(out["image"] ** 2)

        o0 = jnp.array([[0.1, -0.05, -1.5]])
        g = np.asarray(jax.jit(jax.grad(loss))(o0))
        assert np.all(np.isfinite(g))
        eps = 1e-3
        for axis in range(2):  # x,y (z shifts the near plane; skip)
            op = o0.at[0, axis].add(eps)
            om = o0.at[0, axis].add(-eps)
            fd = (float(loss(op)) - float(loss(om))) / (2 * eps)
            np.testing.assert_allclose(g[0, axis], fd, rtol=0.05, atol=1e-4)

    def test_perturb_reproducible(self):
        field = sphere_field()
        rcfg = RenderConfig(num_steps=32, upsample_steps=16, min_near=0.05)
        o = jnp.array([[0.0, 0.0, -1.5]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        k = jax.random.PRNGKey(3)
        a = render_rays(field, rcfg, o, d, key=k)
        b = render_rays(field, rcfg, o, d, key=k)
        np.testing.assert_allclose(np.asarray(a["image"]), np.asarray(b["image"]))

    def test_render_image_chunking(self):
        field = sphere_field()
        rcfg = RenderConfig(num_steps=32, upsample_steps=0, min_near=0.05,
                            max_ray_batch=64)
        n = 100  # not a multiple of the chunk
        o = jnp.tile(jnp.array([[0.0, 0.0, -1.5]]), (n, 1))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
        out = render_image(field, rcfg, o, d, bg_color=0.0)
        assert out["image"].shape == (n, 3)
        full = render_rays(field, rcfg, o, d, bg_color=0.0)
        np.testing.assert_allclose(
            np.asarray(out["image"]), np.asarray(full["image"]), atol=1e-5
        )


class TestPackedShading:
    """Global point-budget compaction (render_rays_grid sample_budget —
    reference mean_count semantics, renderer.py:283-288)."""

    def _setup(self):
        import numpy as np

        from nerfnav_tpu.data.synthetic import textured_sphere_field
        from nerfnav_tpu.ops.marching import MarchConfig
        from nerfnav_tpu.ops.morton import pack_blocks, packbits

        field = textured_sphere_field(radius=0.35)
        mcfg = MarchConfig(bound=1.0, grid_size=32, max_steps=128,
                           samples_per_ray=16, min_near=0.05)
        Hg = mcfg.grid_size
        ii = np.arange(Hg**3)
        c = (np.stack([ii // (Hg * Hg), (ii // Hg) % Hg, ii % Hg], -1) + 0.5) / Hg * 2 - 1
        occ = (np.linalg.norm(c, axis=-1) < 0.5)[None]
        hc = Hg // mcfg.coarse_factor
        f = mcfg.coarse_factor
        occ_c = occ.reshape(1, hc, f, hc, f, hc, f).max(axis=(2, 4, 6)).reshape(1, -1)
        occupancy = {
            "bitfield": packbits(jnp.asarray(occ.astype(np.float32))),
            "bitfield_coarse": packbits(jnp.asarray(occ_c.astype(np.float32))),
        }
        n = 64
        rng = np.random.default_rng(1)
        ro = jnp.asarray(np.concatenate(
            [rng.uniform(-0.5, 0.5, (n, 2)), np.full((n, 1), -1.5)], -1
        ), jnp.float32)
        d = rng.normal(size=(n, 3))
        d[:, 2] = np.abs(d[:, 2]) + 1.0
        rd = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                         jnp.float32)
        return field, occupancy, mcfg, ro, rd

    def test_packed_matches_unpacked_with_ample_budget(self):
        import numpy as np

        from nerfnav_tpu.models import render_rays_grid

        field, occupancy, mcfg, ro, rd = self._setup()
        full = render_rays_grid(field, occupancy, mcfg, ro, rd, bg_color=1.0)
        n_valid = int(full["n_samples"])
        assert n_valid > 0
        packed = render_rays_grid(field, occupancy, mcfg, ro, rd, bg_color=1.0,
                                  sample_budget=((n_valid + 255) // 256) * 256)
        np.testing.assert_allclose(np.asarray(packed["image"]),
                                   np.asarray(full["image"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(packed["depth"]),
                                   np.asarray(full["depth"]), atol=1e-5)

    def test_packed_gradients_match(self):
        import numpy as np

        from nerfnav_tpu.models import (
            NetworkConfig, init_network, make_field, render_rays_grid,
        )

        _, occupancy, mcfg, ro, rd = self._setup()
        cfg = NetworkConfig(bound=1.0, grid_levels=4,
                            grid_log2_hashmap_size=10, grid_max_resolution=64)
        params = init_network(jax.random.PRNGKey(0), cfg)
        gt = jnp.zeros((ro.shape[0], 3))

        def loss(p, budget):
            out = render_rays_grid(make_field(p, cfg), occupancy, mcfg, ro, rd,
                                   bg_color=1.0, sample_budget=budget)
            return jnp.mean((out["image"] - gt) ** 2)

        n_valid = int(render_rays_grid(make_field(params, cfg), occupancy,
                                       mcfg, ro, rd)["n_samples"])
        g_full = jax.grad(lambda p: loss(p, None))(params)
        g_packed = jax.grad(lambda p: loss(p, ((n_valid + 255) // 256) * 256))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_full),
                        jax.tree_util.tree_leaves(g_packed)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-4)

    def test_grouped_packing_matches_global(self):
        """sample_groups > 1 (per-shard packing under a mesh) must equal the
        global packing when every group's budget covers its samples."""
        import numpy as np

        from nerfnav_tpu.models import render_rays_grid

        field, occupancy, mcfg, ro, rd = self._setup()
        full = render_rays_grid(field, occupancy, mcfg, ro, rd, bg_color=1.0)
        n_valid = int(full["n_samples"])
        budget = ((n_valid + 255) // 256) * 256 * 2  # ample for every group
        g1 = render_rays_grid(field, occupancy, mcfg, ro, rd, bg_color=1.0,
                              sample_budget=budget, sample_groups=1)
        g8 = render_rays_grid(field, occupancy, mcfg, ro, rd, bg_color=1.0,
                              sample_budget=budget, sample_groups=8)
        np.testing.assert_allclose(np.asarray(g8["image"]),
                                   np.asarray(full["image"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g8["image"]),
                                   np.asarray(g1["image"]), atol=1e-6)

    def test_truncation_drops_tail_rays_only(self):
        import numpy as np

        from nerfnav_tpu.models import render_rays_grid

        field, occupancy, mcfg, ro, rd = self._setup()
        full = render_rays_grid(field, occupancy, mcfg, ro, rd, bg_color=1.0)
        half = int(full["n_samples"]) // 2
        packed = render_rays_grid(field, occupancy, mcfg, ro, rd, bg_color=1.0,
                                  sample_budget=max(half, 16))
        # early rays (within budget) identical; late rays may fall back to bg
        img_f = np.asarray(full["image"])
        img_p = np.asarray(packed["image"])
        np.testing.assert_allclose(img_p[:8], img_f[:8], atol=1e-5)
        assert np.isfinite(img_p).all()


class TestPackedPrefix:
    """_shade_packed's prefix invariant (models/renderer.py): every marcher
    configuration — including the flags that LOOK like they could punch
    holes mid-prefix (first_k hybrid tails, proxy occlusion termination) —
    must produce per-ray prefix valid masks, and the packed shade must match
    the dense shade under them."""

    def _setup(self, **march_kw):
        import dataclasses

        base = TestPackedShading()
        field, occupancy, mcfg, ro, rd = base._setup()
        if march_kw.pop("with_density", False):
            # SCALED density tables for proxy termination (sample-level via
            # density_grid on the byte marcher; models/occupancy.py layout)
            import numpy as np

            Hg = mcfg.grid_size
            ii = np.arange(Hg**3)
            c = (np.stack([ii // (Hg * Hg), (ii // Hg) % Hg, ii % Hg], -1)
                 + 0.5) / Hg * 2 - 1
            dens = (np.linalg.norm(c, axis=-1) < 0.5).astype(np.float32)[None]
            occupancy = {**occupancy,
                         "density_grid": jnp.asarray(dens * 50.0)}
        mcfg = dataclasses.replace(mcfg, **march_kw)
        return field, occupancy, mcfg, ro, rd

    @staticmethod
    def _assert_prefix(valid):
        import numpy as np

        v = np.asarray(valid)
        counts = v.sum(axis=1)
        expect = np.arange(v.shape[1])[None, :] < counts[:, None]
        np.testing.assert_array_equal(v, expect)

    def test_masks_are_prefix_default(self):
        from nerfnav_tpu.ops.marching import march

        field, occupancy, mcfg, ro, rd = self._setup()
        self._assert_prefix(march(ro, rd, occupancy, mcfg)["valid"])

    def test_masks_are_prefix_first_k(self):
        from nerfnav_tpu.ops.marching import march

        field, occupancy, mcfg, ro, rd = self._setup(first_k=True)
        self._assert_prefix(march(ro, rd, occupancy, mcfg)["valid"])
        # with a stratified key too (random stride phase)
        m = march(ro, rd, occupancy, mcfg, key=jax.random.PRNGKey(3))
        self._assert_prefix(m["valid"])

    def test_masks_are_prefix_proxy_terminate(self):
        from nerfnav_tpu.ops.marching import march

        field, occupancy, mcfg, ro, rd = self._setup(
            proxy_terminate=True, with_density=True)
        self._assert_prefix(march(ro, rd, occupancy, mcfg)["valid"])

    def test_packed_matches_dense_under_flags(self):
        import numpy as np

        from nerfnav_tpu.models import render_rays_grid

        for kw in ({"first_k": True},
                   {"proxy_terminate": True, "with_density": True}):
            field, occupancy, mcfg, ro, rd = self._setup(**dict(kw))
            full = render_rays_grid(field, occupancy, mcfg, ro, rd,
                                    bg_color=1.0)
            n_valid = int(full["n_samples"])
            assert n_valid > 0
            packed = render_rays_grid(
                field, occupancy, mcfg, ro, rd, bg_color=1.0,
                sample_budget=((n_valid + 255) // 256) * 256)
            np.testing.assert_allclose(np.asarray(packed["image"]),
                                       np.asarray(full["image"]), atol=1e-5)
